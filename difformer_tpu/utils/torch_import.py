"""Import the reference's trained PyTorch DIFFormer checkpoints.

The reference's "reproduce large-graph results" path loads a pickled
``state_dict`` (``node classification/test_large_dataset.py:85-98``,
checkpoints saved by ``main-batch.py:154-155``) with keys laid out by
``node classification/difformer.py:147-226``:

    fcs.0.{weight,bias}      input Linear          -> fc_in
    fcs.1.{weight,bias}      output Linear         -> fc_out
    bns.{i}.{weight,bias}    LayerNorms (L+1 of them) -> ln_{i}
    convs.{i}.W{q,k,v}.{weight,bias}               -> conv_{i}.W{q,k,v}

This converter maps those tensors onto our flax param tree (Linear weights
transposed: torch ``[out, in]`` -> flax kernel ``[in, out]``) so a user
switching frameworks can evaluate or fine-tune their existing trained
models here. The inverse direction is provided for round-trips/export.
"""

from __future__ import annotations

import numpy as np


def _np(v):
    if hasattr(v, "detach"):  # torch tensor without importing torch
        # .numpy() aliases the tensor's storage — copy so in-place optimizer
        # updates on the live torch module can't mutate converted params
        return v.detach().cpu().numpy().copy()
    return np.asarray(v)


def params_from_torch_state_dict(state_dict) -> dict:
    """Reference DIFFormer ``state_dict`` -> flax params pytree."""
    params: dict = {}

    def put(mod, leaf, value):
        params.setdefault(mod, {})[leaf] = value

    for key, v in state_dict.items():
        arr = _np(v)
        parts = key.split(".")
        if parts[0] == "fcs":
            mod = "fc_in" if parts[1] == "0" else "fc_out"
            if parts[2] == "weight":
                put(mod, "kernel", arr.T.copy())
            else:
                put(mod, "bias", arr)
        elif parts[0] == "bns":
            mod = f"ln_{parts[1]}"
            leaf = "scale" if parts[2] == "weight" else "bias"
            params.setdefault(mod, {}).setdefault("LayerNorm_0", {})[
                leaf] = arr
        elif parts[0] == "convs":
            mod, proj = f"conv_{parts[1]}", parts[2]
            if proj not in ("Wq", "Wk", "Wv"):
                raise KeyError(f"unexpected conv parameter {key!r}")
            sub = params.setdefault(mod, {}).setdefault(proj, {})
            if parts[3] == "weight":
                sub["kernel"] = arr.T.copy()
            else:
                sub["bias"] = arr
        else:
            raise KeyError(
                f"unrecognized reference state_dict key {key!r} (expected "
                f"fcs./bns./convs. per difformer.py:147-226)"
            )
    return params


def torch_state_dict_from_params(params) -> dict:
    """Inverse of :func:`params_from_torch_state_dict` (numpy values)."""
    sd = {}
    for mod, sub in params.items():
        if mod == "fc_in":
            sd["fcs.0.weight"] = _np(sub["kernel"]).T.copy()
            sd["fcs.0.bias"] = _np(sub["bias"])
        elif mod == "fc_out":
            sd["fcs.1.weight"] = _np(sub["kernel"]).T.copy()
            sd["fcs.1.bias"] = _np(sub["bias"])
        elif mod.startswith("ln_"):
            i = mod[len("ln_"):]
            ln = sub["LayerNorm_0"]
            sd[f"bns.{i}.weight"] = _np(ln["scale"])
            sd[f"bns.{i}.bias"] = _np(ln["bias"])
        elif mod.startswith("conv_"):
            i = mod[len("conv_"):]
            for proj, p in sub.items():
                sd[f"convs.{i}.{proj}.weight"] = _np(p["kernel"]).T.copy()
                sd[f"convs.{i}.{proj}.bias"] = _np(p["bias"])
        else:
            raise KeyError(f"unrecognized param module {mod!r}")
    return sd


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a reference checkpoint file (.pkl/.pt) and convert.

    Tries the safe tensor-only loader first. Falls back to full pickle only
    for the known legacy-format / weights-only refusal errors, and warns
    before doing so — a file crafted to crash the safe loader must not get
    silently executed."""
    import pickle
    import warnings

    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError) as e:
        msg = str(e)
        legacy = (
            "weights_only" in msg
            or "Unsupported" in msg
            or "legacy" in msg.lower()
            or isinstance(e, pickle.UnpicklingError)
        )
        if not legacy:
            raise
        warnings.warn(
            f"safe (weights_only) load of {path!r} failed with: {msg!r}; "
            "falling back to full unpickling — only do this for checkpoint "
            "files you trust",
            stacklevel=2,
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    return params_from_torch_state_dict(sd)
