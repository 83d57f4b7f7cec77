"""Backend-aware jitting of model-init functions.

Eager flax init executes op-by-op; on a remote (tunneled) TPU that pays a
network round trip per op (measured 180 s for the flagship model on the
axon platform), while one jitted program inits in ~40 s.  On CPU the
relation inverts: eager init is fast and compiling the init program costs
more than it saves (a CPU test suite slowed ~2x when init was jitted
unconditionally).
"""

from __future__ import annotations

import jax


def execution_platform() -> str:
    """Platform computations actually run on: honors ``jax.default_device``
    (``jax.default_backend()`` does NOT — it reports the highest-priority
    backend even inside a ``with jax.default_device(cpu)`` scope)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax_default_device also accepts a platform *string*
        # (JAX_DEFAULT_DEVICE=cpu) — no .platform attribute then
        return dev.platform if hasattr(dev, "platform") else str(dev)
    return jax.default_backend()


def jit_init_off_cpu(fn):
    """``jax.jit(fn)`` unless execution targets CPU (see module doc)."""
    return fn if execution_platform() == "cpu" else jax.jit(fn)
