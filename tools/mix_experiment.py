"""Sweep the SPTC3 shared-prior mixing knobs on the real-content corpus.

Each configuration runs in a subprocess (the mix knobs are module-level
env-derived constants). Prints total SPTC bytes per sequence vs the v4
reference sizes recorded in RATIO.md.

Usage: PYTHONPATH=. python tools/mix_experiment.py [sweep|one G KINDS INIT GSTEP]
"""

import os
import subprocess
import sys

V4_512 = {"code": 44512, "terminal": 12550, "document": 99647, "mixed": 89443}

_CHILD = r"""
import sys
import numpy as np
sys.path.insert(0, ".")
from screenpressor_tpu.config import CodecConfig
from screenpressor_tpu.spec.codec import SpecDecoder, SpecEncoder
from tools.real_corpus import SEQUENCES

verify = len(sys.argv) > 1 and sys.argv[1] == "verify"
h, w, n = 288, 512, 8
tot = {}
for name in ("code", "terminal", "document", "mixed"):
    frames = SEQUENCES[name](h, w, n)
    cfg = CodecConfig(width=w, height=h, msr_x=16, msr_y=16)
    se = SpecEncoder(cfg)
    sd = SpecDecoder(cfg) if verify else None
    sz = 0
    for f in frames:
        d, _ = se.encode(f)
        sz += len(d)
        if verify:
            out = sd.decode(d)
            assert np.array_equal(out, f), name
    tot[name] = sz
print(repr(tot))
"""


def run_cfg(g, kinds, init, gstep, verify=False, ctx_bits=None):
    """g=0 now means 'mixing OFF' explicitly (SPTC3 made mixing the
    default); ctx_bits=None likewise pins the pre-SPTC3 4,4 context so the
    sweep's baseline row keeps meaning 'round-2 format'."""
    env = dict(os.environ)
    if g:
        env.update(
            SPTC_MIX=str(g), SPTC_MIX_KINDS=kinds,
            SPTC_MIX_ROW_INIT=str(init), SPTC_MIX_GSTEP=str(gstep),
        )
    else:
        env["SPTC_MIX"] = "0"
    env["SPTC_COLOR_CTX_BITS"] = ctx_bits if ctx_bits else "4,4"
    out = subprocess.run(
        [sys.executable, "-c", _CHILD] + (["verify"] if verify else []),
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-2000:])
        return None
    return eval(out.stdout.strip().splitlines()[-1])


def show(tag, tot):
    if tot is None:
        print(f"{tag}: FAILED")
        return
    parts = [f"{k}={v} ({v / V4_512[k]:.2f}x v4)" for k, v in tot.items()]
    s = sum(tot.values())
    sv = sum(V4_512.values())
    print(f"{tag}: {'  '.join(parts)}  TOTAL {s} ({s / sv:.2f}x v4)", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        g, kinds, init, gstep = (
            int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), int(sys.argv[5]))
        show(f"G={g} kinds={kinds} init={init} gstep={gstep}",
             run_cfg(g, kinds, init, gstep, verify=True))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "ctx":
        show("ctx 4,4 (baseline)", run_cfg(0, "", 0, 0))
        for bits in ("5,3", "6,2", "5,5", "6,4", "6,6"):
            show(f"ctx {bits}", run_cfg(0, "", 0, 0, ctx_bits=bits))
        for bits in ("5,5", "6,4", "6,6"):
            show(f"ctx {bits} + mix", run_cfg(1, "color,nrun", 1, 0, ctx_bits=bits))
        return
    show("baseline (no mix)", run_cfg(0, "", 0, 0))
    show("mix color init=1", run_cfg(1, "color", 1, 0))
    show("mix color init=1 gstep=128", run_cfg(1, "color", 1, 128))
    show("mix color init=4", run_cfg(1, "color", 4, 0))
    show("mix color,nrun init=1", run_cfg(1, "color,nrun", 1, 0))
    show("mix color,nrun,mv,btn init=1", run_cfg(1, "color,nrun,mv,btn", 1, 0))


if __name__ == "__main__":
    main()
