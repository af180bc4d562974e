"""Conditional samplers: constrained-realization portfolio + C_ell steps."""

from .cr import (
    exact_cr, cg_cr, rjpo_cr, aux_gibbs_cr, overrelax_cr, mala_cr,
    aux_then_mala_cr, pcn_cr, fluctuated_rhs, cr_precond, CRInfo,
)
from .joint import (
    exact_joint_cr, cg_joint_cr, synfast_joint, expand_cl_blocks,
    blocks_to_dl,
)
from .cls_samplers import (
    invgamma_dl, centered_cls_sample, propose_truncnorm, truncnorm_logratio,
    make_nc_log_likelihood, nc_cls_sample, invwishart_cls_sample,
    whiten, recenter, NCClsInfo,
)

__all__ = [
    "exact_cr", "cg_cr", "rjpo_cr", "aux_gibbs_cr", "overrelax_cr",
    "mala_cr", "aux_then_mala_cr", "pcn_cr", "fluctuated_rhs", "cr_precond", "CRInfo",
    "invgamma_dl", "centered_cls_sample", "propose_truncnorm",
    "truncnorm_logratio", "make_nc_log_likelihood", "nc_cls_sample",
    "invwishart_cls_sample", "whiten", "recenter", "NCClsInfo",
    "exact_joint_cr", "cg_joint_cr", "synfast_joint", "expand_cl_blocks",
    "blocks_to_dl",
]
