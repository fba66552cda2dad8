"""Deterministic real-content screen-capture corpus.

The synthetic bench content (flat rectangles + dotted lines) is much easier
than real screens; this module renders actual application-like frames with
antialiased TrueType text — the content class the reference was validated on
(`/root/reference/README.md:32-41`: screencasts, text, scrolling).

Sequences (each `n` frames of [H, W, 3] RGB):
- ``code``:     dark-theme editor showing this repo's own source with
                line numbers and token coloring; smooth scroll + cursor.
- ``terminal``: dark terminal appending build/test output line by line.
- ``document``: light document with proportional text, scrolled by lines.
- ``mixed``:    window switches between the above (full-frame changes).

Rendering uses PIL + DejaVu fonts (baked into the image), fixed text from a
checked-in snapshot below, fixed layout — bit-deterministic on a given rig.
"""

from __future__ import annotations

import os

import numpy as np

_MONO = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"
_SANS = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def _fonts(size_px: int):
    from PIL import ImageFont

    return (ImageFont.truetype(_MONO, size_px),
            ImageFont.truetype(_SANS, size_px))


def _source_text() -> list[str]:
    """Real source lines (this repo's bitstream module) as editor content."""
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "screenpressor_tpu", "bitstream.py")
    with open(path) as f:
        lines = f.read().splitlines()
    return lines * 4  # enough rows to scroll through


_TOKEN_COLORS = [
    ("def ", (86, 156, 214)), ("class ", (86, 156, 214)),
    ("return", (197, 134, 192)), ("import ", (197, 134, 192)),
    ("raise ", (197, 134, 192)), ("if ", (197, 134, 192)),
    ("#", (106, 153, 85)), ('"', (206, 145, 120)), ("'", (206, 145, 120)),
]


def _line_color(line: str):
    st = line.lstrip()
    for tok, c in _TOKEN_COLORS:
        if tok in st[:24]:
            return c
    return (212, 212, 212)


def render_code(h: int, w: int, n: int, font_px: int = 13) -> list[np.ndarray]:
    from PIL import Image, ImageDraw

    mono, _ = _fonts(font_px)
    lines = _source_text()
    lh = font_px + 4
    frames = []
    scroll_px = 0
    for t in range(n):
        img = Image.new("RGB", (w, h), (30, 30, 30))
        d = ImageDraw.Draw(img)
        d.rectangle([0, 0, w, 24], fill=(51, 51, 51))          # title bar
        d.text((8, 5), "bitstream.py — screenpressor_tpu", font=mono,
               fill=(180, 180, 180))
        d.rectangle([0, 24, 46, h], fill=(37, 37, 38))         # gutter
        first = scroll_px // lh
        off = scroll_px % lh
        y = 28 - off
        li = first
        while y < h and li < len(lines):
            d.text((8, y), f"{li + 1:4d}", font=mono, fill=(133, 133, 133))
            d.text((54, y), lines[li][: (w - 60) // (font_px * 6 // 10)],
                   font=mono, fill=_line_color(lines[li]))
            y += lh
            li += 1
        # blinking cursor on a "current" line
        if (t // 2) % 2 == 0:
            cy = 28 + lh * 6
            d.rectangle([54 + 7 * 10, cy, 54 + 7 * 10 + 2, cy + font_px],
                        fill=(255, 255, 255))
        frames.append(np.asarray(img, np.uint8).copy())
        # scroll pattern: hold, smooth 3px, line jumps
        scroll_px += (0, 3, 3, lh, 0, 3, lh, 3)[t % 8]
    return frames


_TERM_LINES = [
    "$ python -m pytest tests/ -q",
    "........................................                        [ 24%]",
    "........................................                        [ 49%]",
    "........................................                        [ 73%]",
    ".......................................                         [100%]",
    "165 passed, 11 deselected in 84.12s",
    "$ python bench.py",
    "bench: backend=tpu 1080x1920 x16 frames",
    "bench: enc 46.53 Mpix/s, dec 205.74 Mpix/s, ratio 3620.3x",
    "$ git log --oneline -3",
    "3a469d6 Verified reference-format interop",
    "17ac2de round 2: end-of-round snapshot",
    "c40286a deal_device as destination-sized gather",
    "$ ls screenpressor_tpu/",
    "api.py  bitstream.py  colorspace.py  config.py  jx/  native/",
    "parallel/  spec/  utils/",
    "$ _",
]


def render_terminal(h: int, w: int, n: int, font_px: int = 13) -> list[np.ndarray]:
    from PIL import Image, ImageDraw

    mono, _ = _fonts(font_px)
    lh = font_px + 4
    frames = []
    shown = 1
    for t in range(n):
        img = Image.new("RGB", (w, h), (12, 12, 20))
        d = ImageDraw.Draw(img)
        vis = _TERM_LINES[:shown]
        max_rows = (h - 8) // lh
        vis = vis[-max_rows:]
        for i, ln in enumerate(vis):
            color = (230, 230, 230) if ln.startswith("$") else (160, 200, 160)
            d.text((6, 4 + i * lh), ln, font=mono, fill=color)
        frames.append(np.asarray(img, np.uint8).copy())
        shown = min(shown + 1 + (t % 2), len(_TERM_LINES))
    return frames


def render_document(h: int, w: int, n: int, font_px: int = 14) -> list[np.ndarray]:
    from PIL import Image, ImageDraw

    mono, sans = _fonts(font_px)
    para = (
        "ScreenPressor is a lossless video codec designed for screen "
        "capture: screencasts, conferencing and desktop sharing. It uses "
        "context-adaptive entropy coding with per-pixel prediction and "
        "frame-difference analysis with exact-match motion search. "
    ) * 12
    words = para.split()
    lh = font_px + 6
    # pre-layout lines of ~(w-80)/avg_char_px chars
    cpl = max((w - 100) // (font_px * 55 // 100), 20)
    lines, cur = [], ""
    for word in words:
        if len(cur) + len(word) + 1 > cpl:
            lines.append(cur)
            cur = word
        else:
            cur = (cur + " " + word).strip()
    lines.append(cur)
    frames = []
    first = 0
    for t in range(n):
        img = Image.new("RGB", (w, h), (255, 255, 255))
        d = ImageDraw.Draw(img)
        d.rectangle([0, 0, w, 28], fill=(240, 240, 240))
        d.text((10, 6), "codec-design.md — Documents", font=sans, fill=(60, 60, 60))
        d.text((40, 40), "Lossless screen video coding", font=sans,
               fill=(20, 20, 120))
        y = 40 + 2 * lh
        li = first
        while y < h - 8 and li < len(lines):
            d.text((40, y), lines[li], font=sans, fill=(30, 30, 30))
            y += lh
            li += 1
        frames.append(np.asarray(img, np.uint8).copy())
        first += (0, 1, 2, 0, 1, 3, 0, 2)[t % 8]
    return frames


def render_mixed(h: int, w: int, n: int) -> list[np.ndarray]:
    thirds = max(n // 3, 1)
    seq = (render_code(h, w, thirds) + render_terminal(h, w, thirds)
           + render_document(h, w, n - 2 * thirds))
    return seq[:n]


SEQUENCES = {
    "code": render_code,
    "terminal": render_terminal,
    "document": render_document,
    "mixed": render_mixed,
}


def corpus(h: int, w: int, n: int) -> dict[str, list[np.ndarray]]:
    return {name: fn(h, w, n) for name, fn in SEQUENCES.items()}


if __name__ == "__main__":
    import sys

    h, w = (int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "288x512").split("x"))
    out = corpus(h, w, 8)
    for name, frames in out.items():
        arr = np.stack(frames)
        uniq = len(np.unique(arr.reshape(-1, 3), axis=0))
        print(f"{name}: {arr.shape}, {uniq} distinct colors")
