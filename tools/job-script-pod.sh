#!/bin/bash
# Multi-host pod launch — the TPU-native analogue of the reference's
# job-script.sh (reference: job-script.sh:1-8, which ran 10 *independent*
# single-node chains).  Here every task joins ONE SPMD program over the
# whole allocation: jax.distributed auto-discovers peers from the SLURM
# environment and all chains/diagnostics live in-band on the device mesh.
#
#SBATCH --job-name=gibbs-tpu
#SBATCH --ntasks-per-node=1
#SBATCH --nodes=4
#SBATCH --time=660
#
# On Cloud TPU pods, replace srun with the TPU VM launcher:
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
#     python tools/launch_pod.py --lmax 512 --nchains 256
srun python tools/launch_pod.py --lmax 512 --nchains 256 --n-iter 10000 \
    --out "$SCRATCH/pod_results_${SLURM_JOB_ID}.npz"
