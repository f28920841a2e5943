"""Multi-host logging helpers.

Equivalent of the reference's master-only print patch
(reference: lavila/utils/distributed.py:21-33): on a multi-host pod every
process would otherwise print identical progress lines."""

from __future__ import annotations

import builtins


def setup_for_distributed(is_master: bool, force_token: str = "force"):
    """Silence print() on non-master processes; ``print(..., force=True)``
    still goes through everywhere."""
    base_print = builtins.print

    def gated(*args, **kwargs):
        force = kwargs.pop(force_token, False)
        if is_master or force:
            base_print(*args, **kwargs)

    builtins.print = gated
    return base_print


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0
