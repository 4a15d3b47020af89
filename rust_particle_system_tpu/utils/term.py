"""Terminal frame preview — ANSI true-color half-block rendering.

The reference's defining UX is a live fullscreen window (`src/main.rs:73-80`)
redrawing every frame while sliders move.  On a headless host the closest
faithful analog is streaming frames INTO the terminal: each character cell
shows two vertically-stacked pixels via the upper-half-block glyph with
24-bit foreground (top pixel) and background (bottom pixel) colors.  At the
default 96 columns a 1920x1080 frame becomes a 96x54 preview — coarse, but
live: the fluid visibly falls, pools, and recolors as parameters change.

Used by the interactive REPL's ``watch`` command (runtime/interactive.py).
"""

from __future__ import annotations

import numpy as np

_RESET = "\x1b[0m"
HOME = "\x1b[H"
CLEAR = "\x1b[2J\x1b[H"


def ansi_frame(img_u8: np.ndarray, cols: int = 96) -> str:
    """Render an [H, W, 3|4] uint8 sRGB image as ANSI half-block art.

    Returns a string of ``ceil(rows/2)`` newline-joined lines, where ``rows``
    preserves the image aspect at two pixels per character cell.  Pure string
    building — callers decide cursor control (see :data:`HOME`/:data:`CLEAR`).
    """
    img = np.asarray(img_u8)
    if img.ndim != 3 or img.shape[2] < 3:
        raise ValueError(f"expected [H, W, >=3] uint8 image, got {img.shape}")
    h, w = img.shape[:2]
    cols = max(2, int(cols))
    rows = max(2, round(cols * h / w))
    rows += rows % 2  # half-blocks consume pixel rows in pairs
    ys = np.linspace(0, h - 1, rows).round().astype(int)
    xs = np.linspace(0, w - 1, cols).round().astype(int)
    px = img[np.ix_(ys, xs)][..., :3].astype(int)
    lines = []
    for r in range(0, rows, 2):
        top, bot = px[r], px[r + 1]
        cells = []
        prev = None
        for t, b in zip(top, bot):
            key = (t[0], t[1], t[2], b[0], b[1], b[2])
            if key != prev:  # skip redundant SGR sequences (terminal bandwidth)
                cells.append(
                    f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                    f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m"
                )
                prev = key
            cells.append("▀")
        lines.append("".join(cells) + _RESET)
    return "\n".join(lines)
