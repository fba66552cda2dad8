"""Persistent settings.

Reference analog: the Windows-registry `Configuration`
(`conf.h`/`conf.cpp:32-84`: KeyFrameInterval, ForceInterval, Loss, ForceLoss),
rebuilt as environment variables + an optional JSON settings file.

Precedence: explicit kwargs > SPTC_* env vars > settings file > defaults.
"""

from __future__ import annotations

import json
import os

SETTINGS_PATH = os.environ.get(
    "SPTC_SETTINGS", os.path.expanduser("~/.screenpressor_tpu.json")
)

_KEYS = {
    "kf_interval": int,
    "loss": int,
    "msr_x": int,
    "msr_y": int,
    "msr_low_x": int,
    "msr_low_y": int,
    "k_max": int,
    "target_per_lane": int,
}


def load_settings(path: str | None = None) -> dict:
    path = path or SETTINGS_PATH
    out: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                data = json.load(f)
            for k, cast in _KEYS.items():
                if k in data:
                    out[k] = cast(data[k])
        except (OSError, ValueError):
            pass
    for k, cast in _KEYS.items():
        env = os.environ.get(f"SPTC_{k.upper()}")
        if env is not None:
            try:
                out[k] = cast(env)
            except ValueError:
                pass
    return out


def save_settings(values: dict, path: str | None = None) -> None:
    path = path or SETTINGS_PATH
    current = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                current = json.load(f)
        except (OSError, ValueError):
            current = {}
    current.update({k: v for k, v in values.items() if k in _KEYS})
    with open(path, "w") as f:
        json.dump(current, f, indent=2)


def make_config(width: int, height: int, **overrides):
    """CodecConfig from defaults + settings + env + overrides."""
    from screenpressor_tpu.config import CodecConfig

    vals = load_settings()
    vals.update(overrides)
    return CodecConfig(width=width, height=height, **vals)
