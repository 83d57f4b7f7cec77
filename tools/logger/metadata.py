"""Environment metadata for checkpoints.

Parity target: reference ``tools/logger/metadata.py:8-38`` (platform /
python / framework / device info dict embedded into checkpoint metadata).
"""

from __future__ import annotations

import platform
import sys


def get_environment_info() -> dict:
    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "argv": " ".join(sys.argv),
    }
    try:
        import jax
        info["jax"] = jax.__version__
        try:
            devices = jax.devices()
            info["devices"] = [f"{d.platform}:{d.device_kind}"
                               for d in devices]
            info["device_count"] = len(devices)
            info["process_count"] = jax.process_count()
        except Exception as e:  # backend may be unavailable
            info["devices"] = f"unavailable ({e})"
    except Exception:
        info["jax"] = "not installed"
    try:
        import flax
        import optax
        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info


if __name__ == "__main__":
    for k, v in get_environment_info().items():
        print(f"{k}: {v}")
