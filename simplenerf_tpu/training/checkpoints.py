"""Checkpoint save/restore: params + optimizer state + iteration.

Serialized with flax msgpack (pure pytree bytes, no pickle). Files follow
the reference's naming (`Model_IterNNNNNN` + a `Model_Latest` pointer,
src/Trainer01.py:352-381) so run directories look familiar; restore requires
a structurally matching target pytree, which doubles as an architecture
drift guard on resume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import flax.serialization as fser


def save_checkpoint(output_dir: Path, iteration: int, params: Any, opt_state: Any) -> Path:
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    state = {"iteration": iteration, "params": params, "opt_state": opt_state}
    path = output_dir / f"Model_Iter{iteration:06}.msgpack"
    path.write_bytes(fser.to_bytes(state))
    latest = output_dir / "Model_Latest.msgpack"
    if latest.exists() or latest.is_symlink():
        latest.unlink()
    latest.symlink_to(path.name)
    return path


def latest_checkpoint(output_dir: Path) -> Optional[Path]:
    latest = Path(output_dir) / "Model_Latest.msgpack"
    return latest if latest.exists() else None


def load_checkpoint(path: Path, params_target: Any, opt_state_target: Any = None):
    """Restore (iteration, params, opt_state) into the given pytree structures.

    opt_state_target may be None (inference-only restore). Restoration goes
    through the raw msgpack state dict, so an optimizer mismatch only matters
    when the optimizer state is actually requested.

    Checkpoints written before the flat-vector Adam change hold per-leaf
    moment pytrees; those are migrated in place (ravel the saved moments in
    the params flatten order — Adam is elementwise, so the flat state is
    mathematically identical), falling back to fresh optimizer state with a
    warning if the layout is unrecognizable.
    """
    raw = fser.msgpack_restore(Path(path).read_bytes())
    params = fser.from_state_dict(params_target, raw["params"])
    opt_state = None
    if opt_state_target is not None:
        if _is_per_leaf_adam(raw.get("opt_state"), opt_state_target):
            opt_state = _migrate_per_leaf_adam(raw["opt_state"], params_target, opt_state_target)
        else:
            try:
                opt_state = fser.from_state_dict(opt_state_target, raw["opt_state"])
            except (ValueError, KeyError, TypeError):
                opt_state = _migrate_per_leaf_adam(
                    raw["opt_state"], params_target, opt_state_target
                )
    return int(raw["iteration"]), params, opt_state


def _is_per_leaf_adam(raw_opt: Any, opt_state_target: Any) -> bool:
    """True when the saved state holds per-leaf moment pytrees (dicts) while
    the target expects flat moment vectors (arrays). from_state_dict does not
    validate leaf types, so this mismatch must be caught structurally."""
    try:
        adam_raw = raw_opt["0"] if "0" in raw_opt else raw_opt[0]
        target_mu = opt_state_target[0].mu
        return isinstance(adam_raw["mu"], dict) and not isinstance(target_mu, dict)
    except (KeyError, TypeError, IndexError, AttributeError):
        return False


def _migrate_per_leaf_adam(raw_opt: Any, params_target: Any, opt_state_target: Any):
    """Old per-leaf optax.adam state -> flat-vector Adam state.

    The old state dict is {"0": {"count", "mu": <params-tree>, "nu": <...>},
    "1": {}}; restoring mu/nu through the params target pins the leaf order
    to ravel_pytree's, then the moments concatenate into the flat vectors the
    current optimizer expects.
    """
    import warnings

    import jax.flatten_util

    try:
        adam_raw = raw_opt["0"] if "0" in raw_opt else raw_opt[0]
        mu_tree = fser.from_state_dict(params_target, adam_raw["mu"])
        nu_tree = fser.from_state_dict(params_target, adam_raw["nu"])
        flat_mu, _ = jax.flatten_util.ravel_pytree(mu_tree)
        flat_nu, _ = jax.flatten_util.ravel_pytree(nu_tree)
        scale_state = opt_state_target[0]._replace(
            count=adam_raw["count"], mu=flat_mu, nu=flat_nu
        )
        warnings.warn("migrated per-leaf Adam checkpoint state to the flat-vector layout")
        return (scale_state,) + tuple(opt_state_target[1:])
    except Exception:  # pragma: no cover - best-effort migration
        warnings.warn(
            "checkpoint optimizer state layout is unrecognizable; "
            "resuming with FRESH optimizer state (Adam moments reset)"
        )
        return opt_state_target
