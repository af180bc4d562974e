"""Theory-spectrum I/O.

The reference generates theory C_ell by calling the CLASS Boltzmann code in
process (utils.py:17-47, x (2.7255e6)^2 K^2 -> muK^2).  Boltzmann codes stay
outside this framework (SURVEY.md 2.2 item 4): spectra load from files
(CAMB/CLASS text or .npy) or come from the analytic toys in
inference.simulate.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_cls", "KCMB_UK"]

KCMB_UK = 2.7255e6   # K -> muK conversion the reference applies (utils.py:36)


def load_cls(path: str, lmax: int, columns=("tt", "ee", "bb", "te"),
             input_is_dl: bool = True, k_to_uk: bool = False) -> dict:
    """Load theory spectra from a file.

    .npy / .npz : array (ncols, lmax+1) or dict of named arrays
    .txt / .dat : CAMB-style text, first column ell, then the named columns

    Returns dict name -> (lmax+1,) D_ell array (muK^2), monopole/dipole
    zeroed.  input_is_dl=False converts C_ell -> D_ell; k_to_uk applies the
    reference's (2.7255e6)^2 unit conversion."""
    if path.endswith(".npz"):
        z = np.load(path)
        raw = {k: np.asarray(z[k], dtype=np.float64) for k in z.files}
    elif path.endswith(".npy"):
        arr = np.load(path)
        raw = {c: np.asarray(arr[i], dtype=np.float64)
               for i, c in enumerate(columns[: arr.shape[0]])}
    else:
        data = np.loadtxt(path)
        ells = data[:, 0].astype(int)
        raw = {}
        for i, c in enumerate(columns[: data.shape[1] - 1]):
            full = np.zeros(int(ells.max()) + 1)
            full[ells] = data[:, i + 1]
            raw[c] = full
    out = {}
    for name, arr in raw.items():
        dl = np.zeros(lmax + 1)
        n = min(lmax + 1, arr.shape[0])
        dl[:n] = arr[:n]
        if not input_is_dl:
            ell = np.arange(lmax + 1, dtype=np.float64)
            dl = dl * ell * (ell + 1.0) / (2.0 * np.pi)
        if k_to_uk:
            dl = dl * KCMB_UK ** 2
        dl[:2] = 0.0
        out[name] = dl
    return out
