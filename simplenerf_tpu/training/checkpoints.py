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
    """
    raw = fser.msgpack_restore(Path(path).read_bytes())
    params = fser.from_state_dict(params_target, raw["params"])
    opt_state = None
    if opt_state_target is not None:
        opt_state = fser.from_state_dict(opt_state_target, raw["opt_state"])
    return int(raw["iteration"]), params, opt_state
