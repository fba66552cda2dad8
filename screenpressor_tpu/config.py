"""Codec constants and configuration.

The constants and the lane policy here are *format-normative* (FORMAT.md):
every implementation (numpy spec, JAX, native) derives identical bitstreams
from them. Reference analogs: PROB_BITS/PROB_SCALE `ans_contexts.h:66-67`,
RANS_L `rans_byte.h:47`, STEP ~ STEP_FX `ans_contexts.h:59`.
"""

from __future__ import annotations

import os

import dataclasses

# ---------------------------------------------------------------------------
# Entropy-coder constants (format-normative)
# ---------------------------------------------------------------------------

PROB_BITS = 14
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 23  # lower bound of the rANS normalization interval
STEP = 512  # adaptation increment (tuned on corpus; see FORMAT.md)
RESCALE_SHIFT = 13  # fixed-point shift of the scale-to-fill rescale factor
# color context quantization:
#   ctx = ((a >> (8 - BITS_A)) << BITS_B) | (b >> (8 - BITS_B))
# The reference uses a symmetric 12-bit (6+6) context (`screencap.h:35-36`);
# SPTC uses an asymmetric split tuned on the real-content corpus under the
# constraint that 3 * 2^(A+B) * 256 table entries stay VMEM-resident for the
# Pallas section kernels. SPTC_COLOR_CTX_BITS="a,b" (or the legacy symmetric
# SPTC_COLOR_CTX_HALF_BITS=n) overrides for format experiments (spec path
# only; the Pallas kernels are compiled for the default).
if "SPTC_COLOR_CTX_BITS" in os.environ:
    COLOR_CTX_BITS_A, COLOR_CTX_BITS_B = (
        int(v) for v in os.environ["SPTC_COLOR_CTX_BITS"].split(",")
    )
elif "SPTC_COLOR_CTX_HALF_BITS" in os.environ:
    _hb = int(os.environ["SPTC_COLOR_CTX_HALF_BITS"])
    COLOR_CTX_BITS_A = COLOR_CTX_BITS_B = _hb
else:
    # SPTC4 default (round 4): full precision on the first conditioning
    # channel, 4 bits on the second. Round-4 sweep on the real-content
    # corpus (512x288, vs reference v4 bytes): (8,2) 0.957 overall with
    # code 1.023 / terminal 1.022; (8,3) 0.915; (8,4) 0.881 with EVERY
    # class < 1.00 (code 0.940, terminal 0.963). (7,4) and the reference's
    # symmetric (6,6) are worse — full precision on channel A dominates.
    # The 4096-row/plane table still kernelizes (windowed per-plane
    # access); the VMEM-guard scan fallback covers rigs where it doesn't.
    COLOR_CTX_BITS_A, COLOR_CTX_BITS_B = 8, 4
COLOR_CTX_ROWS = 1 << (COLOR_CTX_BITS_A + COLOR_CTX_BITS_B)
# legacy symmetric aliases (jx/kernels uses the generalized pair)
COLOR_CTX_HALF_BITS = COLOR_CTX_BITS_B
COLOR_CTX_SHIFT = 8 - COLOR_CTX_BITS_B
COLOR_CTX_SHIFT_A = 8 - COLOR_CTX_BITS_A

# Lane policy (format-normative)
K_MAX = 256
TARGET_PER_LANE = 256
# thinning tier for large sections (see lane_count): sections beyond
# LANE_THIN_FLOOR lanes target LANE_THIN_MULT*TARGET_PER_LANE records/lane.
# Round-5 sweep at 1080p (idle keyframe bytes / v4=5131): (64,8) 5040,
# (32,16) 4562 — every 1080p class lands <= v4 at (32,16), and fewer lanes
# also shrink the section kernels' [K,K] row-mask matmuls. SPTC_LANE_THIN
# ="floor,mult" overrides for format experiments.
if "SPTC_LANE_THIN" in os.environ:
    LANE_THIN_FLOOR, LANE_THIN_MULT = (
        int(v) for v in os.environ["SPTC_LANE_THIN"].split(","))
else:
    LANE_THIN_FLOOR, LANE_THIN_MULT = 32, 16

# Frame header nibbles
SPTC_VERSION_NIBBLE = 0xA
ALG_FLAT = 1
ALG_I = 2
ALG_P = 3
ALG_RAW = 4  # uncompressed escape: bounds worst-case output at raw + 5 bytes
# format-extension prefix chunk: emitted before a keyframe when the source
# pixel format is not RGB24, so a decoder can self-configure from the stream
# alone (reference analog: `CompressGetFormat` embeds the 16-bit channel
# masks as 12 extra header bytes, `screenpressor.cpp:317-339`)
ALG_FMT = 5

# Block geometry (reference: 16x16 blocks, `screencap.cpp:87-88`)
BLOCK = 16

# Encoder segmentation policy (non-normative for decoders): I-frame runs
# break at seg_tile-pixel boundaries so classification is a tile-per-lane
# state machine (Pallas kernel) instead of a serial walk. All encoder
# implementations share this policy so streams stay byte-identical.
SEG_TILE = 1024  # legacy tile for small frames (golden streams pinned)


def seg_tile(n: int, w: int) -> int:
    """Segmentation tile for a frame of n pixels, width w (shared encoder
    policy; any tiling decodes). Small frames keep the legacy 1024. Large
    frames use whole-row tiles near 16K pixels: every tile boundary forces
    a run break whose atypical run length dilutes the nrun tables, which
    measured 7059 -> ~5100 B on a 1080p idle keyframe (round 5). Row
    alignment keeps sp row-shard seams on tile boundaries."""
    if n <= 128 * SEG_TILE:
        return SEG_TILE
    cap = min(16384, n // 64)
    rows = max(1, cap // w)
    return rows * w

# Compact color-table encode buckets (shape-only, NOT format-relevant): an
# encoder whose color section touches <= bucket distinct context rows runs
# its section kernel over a gathered touched-row table of that static size
# instead of the full 3*COLOR_CTX_ROWS window (jx.coder
# color_compact_sections). Streams are byte-identical either way; this only
# bounds the per-substep table gather/scatter cost on TPU.
COL_COMPACT_BUCKETS = (256, 1024)

# Pixel types (reference `screencap.cpp:502-556`)
PT_LITERAL = 0
PT_LEFT = 1
PT_ABOVE = 2
PT_PREVFRAME = 3  # P-frames only
PT_GRADIENT = 4
PT_ABOVELEFT = 5
NUM_PTYPES = 6

# Block types (reference `screencap.cpp:1033-1042`)
BT_UNCHANGED = 0
BT_FULL_DATA = 1
BT_PARTIAL_DATA = 2
BT_FULL_MOTION = 3
BT_PARTIAL_MOTION = 4

# Motion coding offset: mv symbols are component + MV_OFFSET, alphabet 512
MV_OFFSET = 256

MAX_RUN = 255

# Table kinds: name -> (n_contexts, alphabet)
TABLE_KINDS = {
    "ptype": (NUM_PTYPES, NUM_PTYPES),
    "nrun": (NUM_PTYPES, 256),
    "color": (3 * COLOR_CTX_ROWS, 256),
    "bt": (1, 5),
    "btn": (1, 256),
    "sxy": (4, 16),
    "mvflag": (1, 2),
    "mv": (2, 512),
}


def kind_step(name: str) -> int:
    return STEP


# --- SPTC3 dynamic-backoff mixing (format-normative) ---
# Kinds whose context rows are mixed with one per-kind GLOBAL row, scaled at
# coding time to fill exactly the code space the row leaves unused:
#   spare = (PROB_SCALE - A) - cntsum_row          (clamped at 0)
#   g_eff = max((gcnt * ((spare << 13) // gsum)) >> 13, 1)
#   eff   = cnt_row + g_eff                        (sum <= PROB_SCALE)
# Mixed-kind rows start EMPTY and their counts are scaled up to a fill
# target that grows with the row's observation mass S:
#   target = (PROB_SCALE - 2A) * S // (S + MIX_ESC_C)
#   row_eff = (cnt * ((target << 13) // S)) >> 13      (zero rows stay zero)
#   spare   = (PROB_SCALE - A) - sum(row_eff)
#   eff     = row_eff + max((gcnt * ((spare << 13) // gsum)) >> 13, 1)
# A context's few seen symbols therefore take most of the code space after
# a handful of hits — the reference's escalating-alphabet behavior
# (`ans_contexts.h:98-160`) — while the global row prices unseen symbols.
# SPTC_MIX_KINDS / SPTC_MIX_ESC override for format experiments (spec path).
MIX_KINDS = tuple(
    k for k in os.environ.get("SPTC_MIX_KINDS_DEFAULT", "color,nrun").split(",") if k
)
MIX_ROW_INIT = 0
MIX_ESC_C = 256


def kind_mixed(name: str) -> bool:
    return name in MIX_KINDS


def kind_gstep(name: str) -> int:
    """Global-row adaptation increment for a mixed kind."""
    return kind_step(name)


def kind_globals(name: str) -> int:
    """Number of global rows for a mixed kind (row r backs off to global
    r // (rows // n)). Measured: per-plane color globals LOSE ~2% on the
    real corpus — R/G/B literals correlate strongly on antialiased text, so
    one shared global warming 3x faster beats three specialized ones. Kept
    as an experiment knob (SPTC_MIX_G3=1)."""
    if name == "color" and os.environ.get("SPTC_MIX_G3") == "1":
        return 3
    return 1


def color_ctx(a: int, b: int) -> int:
    """Color context chain index from two conditioning bytes (FORMAT.md)."""
    return ((a >> COLOR_CTX_SHIFT_A) << COLOR_CTX_BITS_B) | (b >> COLOR_CTX_SHIFT)

I_SECTION_TABLES = ("ptype", "nrun", "color")
P_SECTION_TABLES = ("ptype", "nrun", "color", "bt", "btn", "sxy", "mvflag", "mv")


def next_pow2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def pad_cap(n: int) -> int:
    """Capacity bucket for data-dependent record/payload arrays (shape-only;
    not format-relevant — lanes encode exactly n records regardless).

    TPU: tight pow2 buckets. CPU: floor at 64 — on the 1-core test rigs
    every distinct capacity is another multi-second XLA compile, while the
    padding compute is negligible."""
    import jax

    cap = next_pow2(max(n, 1))
    if jax.default_backend() == "cpu":
        return max(cap, 64)
    return cap


def lane_count(n_records: int, k_max: int = K_MAX, target: int = TARGET_PER_LANE) -> int:
    """Number of interleaved rANS lanes for a section of n_records
    (FORMAT.md "Lane policy", format-normative).

    Small sections target `target` records/lane (parallel warm-up, short
    scans). Sections beyond 64 lanes thin to 8*target records/lane: every
    lane costs ~6 B of stream overhead (4 B rANS state flush + a size-table
    entry), which at 256 lanes measured ~3 KB per 1080p keyframe — 28% of
    the frame (round 5, RATIO.md). Sections with n <= 64*target are
    unaffected (golden streams pinned at small sizes stay valid)."""
    if n_records <= 0:
        return 1
    k = next_pow2(-(-n_records // target))
    if k > LANE_THIN_FLOOR:
        k = max(LANE_THIN_FLOOR,
                next_pow2(-(-n_records // (LANE_THIN_MULT * target))))
    return min(k_max, k)


def lane_ranges(n_records: int, k: int) -> list[tuple[int, int]]:
    """Contiguous (start, length) per lane; lanes < n%k get one extra record."""
    base, rem = divmod(n_records, k)
    out = []
    start = 0
    for i in range(k):
        ln = base + (1 if i < rem else 0)
        out.append((start, ln))
        start += ln
    return out


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Session configuration (reference analog: `CodecParameters`,
    `screencap.h:49-55`, plus registry knobs `conf.h`/`conf.cpp`)."""

    width: int
    height: int
    # keyframe policy (reference default 500, `conf.h:7`)
    kf_interval: int = 500
    # bit-truncation loss 0..5 (reference `screencap.cpp:127-139`)
    loss: int = 0
    # motion search ranges (reference: ±256 axis scans / ±8 dense window,
    # `screenpressor.cpp:377-378`)
    msr_x: int = 256
    msr_y: int = 256
    msr_low_x: int = 8
    msr_low_y: int = 8
    # lane policy overrides (must match between encoder and decoder)
    k_max: int = K_MAX
    target_per_lane: int = TARGET_PER_LANE
    # serving profile: pin the lane count for every section so batched
    # multi-stream scans share one static shape (parallel/serving.py)
    k_fixed: int | None = None

    def lanes(self, n_records: int) -> int:
        if self.k_fixed is not None:
            return self.k_fixed
        return lane_count(n_records, self.k_max, self.target_per_lane)

    @property
    def nbx(self) -> int:
        return -(-self.width // BLOCK)

    @property
    def nby(self) -> int:
        return -(-self.height // BLOCK)
