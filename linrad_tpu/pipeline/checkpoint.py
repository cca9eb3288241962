"""Receiver state checkpoint/resume.

The reference checkpoints configuration only (par_* files, calibration;
signal state is never saved — "resume" = replay the raw recording,
SURVEY.md §5).  Here the full pipeline state is a pytree, so saving and
restoring mid-stream is trivial and exact: processing can stop after
block N and resume bit-identically — useful for long unattended EME
captures and for elastic batch processing."""

from __future__ import annotations

import json

import numpy as np
import jax

from ..params import RxParams


def save_receiver(path: str, rx) -> None:
    """Save params + full pipeline state (+AFC/controller state)."""
    leaves, treedef = jax.tree_util.tree_flatten(rx.state)
    data = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "params": rx.params.to_json(),
        "tune_bin": np.asarray(rx._tune_bin).tolist(),
        "tune_frac": np.asarray(rx._tune_frac).tolist(),
        "tune_slope": (None if rx._tune_slope is None
                       else np.asarray(rx._tune_slope).tolist()),
        "steps_done": rx._steps_done,
        "n_leaves": len(leaves),
    }
    if rx.afc is not None:
        meta["afc"] = {
            "status": rx.afc.status, "freq_hz": rx.afc.freq_hz,
            "times": list(rx.afc._times), "freqs": list(rx.afc._freqs),
            "weights": list(rx.afc._weights),
        }
    np.savez(path, __meta__=json.dumps(meta), **data)


def load_receiver(path: str):
    """Rebuild a Receiver resuming exactly where it stopped."""
    from .receiver import Receiver

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    params = RxParams.from_json(meta["params"])
    rx = Receiver(params)
    treedef = jax.tree_util.tree_structure(rx.state)
    import jax.numpy as jnp
    rx.state = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves])
    rx._tune_bin = jnp.asarray(np.asarray(meta["tune_bin"]))
    rx._tune_frac = jnp.asarray(meta.get("tune_frac", 0.0), jnp.float32)
    slope = meta.get("tune_slope")
    rx._tune_slope = (None if slope is None
                      else jnp.asarray(slope, jnp.float32))
    rx._steps_done = meta["steps_done"]
    if rx.afc is not None and "afc" in meta:
        a = meta["afc"]
        rx.afc.status = a["status"]
        rx.afc.freq_hz = a["freq_hz"]
        rx.afc._times = list(a["times"])
        rx.afc._freqs = list(a["freqs"])
        rx.afc._weights = list(a["weights"])
    return rx
