"""Per-block activation rematerialization (gradient checkpointing).

``jax.checkpoint`` around the WHOLE apply saves nothing at peak: the backward
pass recomputes the entire forward and holds every recomputed activation
live at once — measured identical peak to no-remat (896² b4 still needs
19.9 GB, r2). Real memory scaling needs SEGMENTED checkpointing: wrap each
residual/decoder block in ``nn.remat`` so the backward recomputes one block
at a time and peak activation memory drops to O(num_blocks · block_io).

``nn.remat`` preserves the module class name, so parameter trees and
checkpoints are identical with the flag on or off (asserted in
tests/test_models.py).

The flag is process-global and read at trace time — set it (via
cfg.remat=true → octseg.train.train) before the step is jitted. Concurrent
trials in one process share it.
"""

from __future__ import annotations

from flax import linen as nn

_ENABLED = False


def set_block_remat(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def block_remat_enabled() -> bool:
    return _ENABLED


_CACHE = {}


def maybe_remat(cls, static_argnums=(2,)):
    """nn.remat(cls) when enabled (static_argnums marks the ``train`` flag,
    counting ``self`` as 0); the class itself otherwise. The wrapped class
    keeps the original __name__ — flax derives module auto-names (and hence
    parameter paths) from it, and checkpoints must be remat-agnostic."""
    if not _ENABLED:
        return cls
    key = (cls, tuple(static_argnums))
    if key not in _CACHE:
        wrapped = nn.remat(cls, static_argnums=static_argnums)
        wrapped.__name__ = cls.__name__
        _CACHE[key] = wrapped
    return _CACHE[key]
