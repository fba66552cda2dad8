"""Configuration tool — the headless analog of the reference's configure/about
dialogs (`screenpressor.cpp:87-247`, `screenpressor.rc`: keyframe-interval
radio+edit, loss slider with % labels, about box).

The persistent store is `utils/settings.py` (JSON file + SPTC_* env
overrides), the rebuild's analog of the `Software\\ScreenPressor` registry keys
(`conf.cpp:32-84`). Encoder sessions pick these up through
`utils.settings.make_config`.

Usage:
  python tools/spconfig.py show                 # current effective settings
  python tools/spconfig.py set KEY VALUE [...]  # persist one or more settings
  python tools/spconfig.py reset [KEY ...]      # drop persisted keys (or all)
  python tools/spconfig.py about
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from screenpressor_tpu.utils import settings as st

# loss slider labels, reference `ShowLossString` (`screenpressor.cpp:163-173`)
_LOSS_PCT = {0: "lossless", 1: "~97%", 2: "~94%", 3: "~88%", 4: "~75%"}

_HELP = {
    "kf_interval": "forced keyframe interval in frames (reference default 500)",
    "loss": "bit-truncation loss 0-4 (0 = lossless)",
    "msr_x": "motion search range, horizontal axis scan (reference 256)",
    "msr_y": "motion search range, vertical axis scan (reference 256)",
    "msr_low_x": "dense motion window half-width (reference 8)",
    "msr_low_y": "dense motion window half-height (reference 8)",
    "k_max": "max rANS lanes per section (format-normative; default 256)",
    "target_per_lane": "records per lane target (format-normative; default 256)",
}


def cmd_show() -> int:
    eff = st.load_settings()
    persisted = {}
    if os.path.exists(st.SETTINGS_PATH):
        try:
            with open(st.SETTINGS_PATH) as f:
                persisted = json.load(f)
        except (OSError, ValueError):
            pass
    print(f"settings file: {st.SETTINGS_PATH}")
    for key, help_text in _HELP.items():
        parts = []
        if key in persisted:
            parts.append(f"file={persisted[key]}")
        env = os.environ.get(f"SPTC_{key.upper()}")
        if env is not None:
            parts.append(f"env={env}")
        val = eff.get(key, "(default)")
        extra = f"  [{', '.join(parts)}]" if parts else ""
        note = ""
        if key == "loss" and isinstance(val, int) and val in _LOSS_PCT:
            note = f" ({_LOSS_PCT[val]})"
        print(f"  {key:16} = {val}{note}{extra}")
        print(f"    {help_text}")
    return 0


def cmd_set(args: list[str]) -> int:
    if len(args) < 2 or len(args) % 2:
        print("usage: spconfig.py set KEY VALUE [KEY VALUE ...]", file=sys.stderr)
        return 2
    vals = {}
    for key, raw in zip(args[::2], args[1::2]):
        if key not in _HELP:
            print(f"unknown key {key!r}; keys: {', '.join(_HELP)}", file=sys.stderr)
            return 2
        try:
            val = int(raw)
        except ValueError:
            print(f"{key} must be an integer (got {raw!r})", file=sys.stderr)
            return 2
        if key == "loss" and not 0 <= val <= 4:
            print("loss must be 0-4", file=sys.stderr)
            return 2
        if key == "kf_interval" and val < 0:
            print("kf_interval must be >= 0", file=sys.stderr)
            return 2
        vals[key] = val
    st.save_settings(vals)
    print(f"saved {vals} to {st.SETTINGS_PATH}")
    return 0


def cmd_reset(keys: list[str]) -> int:
    if not os.path.exists(st.SETTINGS_PATH):
        print("nothing persisted")
        return 0
    if not keys:
        os.remove(st.SETTINGS_PATH)
        print(f"removed {st.SETTINGS_PATH}")
        return 0
    try:
        with open(st.SETTINGS_PATH) as f:
            current = json.load(f)
    except (OSError, ValueError):
        current = {}
    for k in keys:
        current.pop(k, None)
    with open(st.SETTINGS_PATH, "w") as f:
        json.dump(current, f, indent=2)
    print(f"dropped {keys}; remaining: {current}")
    return 0


def cmd_about() -> int:
    from screenpressor_tpu import __version__

    print(f"screenpressor_tpu {__version__} — TPU-native lossless screen codec")
    print("formats: SPTC (native), SCPR v2/v3/v4 (reference interop)")
    return 0


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("show", "set", "reset", "about"):
        print(__doc__.strip(), file=sys.stderr)
        return 2
    cmd = sys.argv[1]
    if cmd == "show":
        return cmd_show()
    if cmd == "set":
        return cmd_set(sys.argv[2:])
    if cmd == "reset":
        return cmd_reset(sys.argv[2:])
    return cmd_about()


if __name__ == "__main__":
    sys.exit(main())
