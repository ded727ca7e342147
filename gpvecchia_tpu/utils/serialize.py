"""Spec serialization: save/load the parameter-free VecchiaSpec as .npz.

The spec is the expensive host artifact (maxmin ordering + neighbor search:
~10 s at n=1e5); the device plan and multifrontal structure rebuild from it
in ~1-2 s, so persisting the spec alone removes nearly all per-process
preprocessing.  This is the serializable analogue of the reference's reusable
``vecchia.approx`` object (/root/reference/R/vecchia_specify.R:3-5; SURVEY §5
checkpoint item).
"""

from __future__ import annotations

import numpy as np

from ..spec import VecchiaSpec

__all__ = ["save_spec", "load_spec"]

_ARRAY_FIELDS = ("locsord", "NNarray", "cond_latent", "has_latent", "has_obs",
                 "ord", "ord_z", "known_pts")
_SCALAR_FIELDS = ("ordering_pred", "cond_yz", "conditioning", "ic0", "n_obs",
                  "n_pred", "mra_eff_m")


def save_spec(spec: VecchiaSpec, path) -> None:
    """Write a VecchiaSpec to ``path`` (.npz)."""
    data = {}
    for f in _ARRAY_FIELDS:
        v = getattr(spec, f)
        if v is not None:
            data[f] = np.asarray(v)
    for f in _SCALAR_FIELDS:
        v = getattr(spec, f)
        data["meta_" + f] = np.asarray("" if v is None else v)
    np.savez_compressed(path, **data)


def load_spec(path) -> VecchiaSpec:
    """Load a VecchiaSpec previously written by save_spec."""
    with np.load(path, allow_pickle=False) as z:
        kw = {}
        for f in _ARRAY_FIELDS:
            kw[f] = z[f] if f in z.files else None
        for f in _SCALAR_FIELDS:
            raw = z["meta_" + f][()]
            s = str(raw)
            if f == "ic0":
                kw[f] = s in ("True", "true", "1")
            elif f in ("n_obs", "n_pred"):
                kw[f] = int(s)
            elif f == "mra_eff_m":
                kw[f] = None if s in ("", "None") else int(s)
            else:
                kw[f] = s
    return VecchiaSpec(**kw)
