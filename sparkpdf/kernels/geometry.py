"""Affine 2-D page geometry — SURVEY.md §2.10 (G1-G4) + §2.6 (O3).

Transformation mirrors the reference's CTM algebra
(/root/reference/_page.py:91-168): a 3x3 matrix kept as the compressed
6-tuple (a, b, c, d, e, f). PageRange mirrors pagerange.py:34-126
(python slice syntax, negative indices)."""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

Matrix = Tuple[float, float, float, float, float, float]

IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def matrix_multiply(a: Matrix, b: Matrix) -> Matrix:
    """(a then b) as 3x3 [[a0 a1 0][a2 a3 0][a4 a5 1]] products
    (parity: matrixMultiply, _utils.py:183-187)."""
    a0, a1, a2, a3, a4, a5 = a
    b0, b1, b2, b3, b4, b5 = b
    return (
        a0 * b0 + a1 * b2,
        a0 * b1 + a1 * b3,
        a2 * b0 + a3 * b2,
        a2 * b1 + a3 * b3,
        a4 * b0 + a5 * b2 + b4,
        a4 * b1 + a5 * b3 + b5,
    )


class Transformation:
    """Chainable CTM builder (parity: _page.py:91-168).

    Parity quirk kept on purpose: the reference's ``compress``
    (_page.py:130-138) reads the ZERO column for (e, f), so ``scale``
    and ``rotate`` drop any accumulated translation — callers must
    translate LAST, exactly as the reference's own merge*Page helpers
    do. Use :func:`matrix_multiply` directly for mathematically-correct
    composition."""

    def __init__(self, ctm: Matrix = IDENTITY):
        self.ctm = tuple(float(v) for v in ctm)

    def translate(self, tx: float = 0, ty: float = 0) -> "Transformation":
        a, b, c, d, e, f = self.ctm
        return Transformation((a, b, c, d, e + tx, f + ty))

    def scale(self, sx: Optional[float] = None, sy: Optional[float] = None):
        if sx is None and sy is None:
            raise ValueError("Either sx or sy must be specified")
        sx = sy if sx is None else sx
        sy = sx if sy is None else sy
        m = matrix_multiply(self.ctm, (sx, 0, 0, sy, 0, 0))
        return Transformation((m[0], m[1], m[2], m[3], 0.0, 0.0))

    def rotate(self, degrees: float) -> "Transformation":
        import math

        r = math.radians(degrees)
        m = matrix_multiply(
            self.ctm, (math.cos(r), math.sin(r), -math.sin(r), math.cos(r), 0, 0)
        )
        return Transformation((m[0], m[1], m[2], m[3], 0.0, 0.0))

    def apply(self, x: float, y: float) -> Tuple[float, float]:
        a, b, c, d, e, f = self.ctm
        return (a * x + c * y + e, b * x + d * y + f)

    def apply_rect(self, rect) -> Tuple[float, float, float, float]:
        llx, lly, urx, ury = (float(v) for v in rect)
        pts = [
            self.apply(llx, lly), self.apply(urx, lly),
            self.apply(llx, ury), self.apply(urx, ury),
        ]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return (min(xs), min(ys), max(xs), max(ys))


# --- page ranges (parity: pagerange.py:34-126) -------------------------------

_RANGE_RE = re.compile(
    r"^(?P<start>-?\d*)(?::(?P<stop>-?\d*)(?::(?P<step>-?\d*))?)?$"
)


def parse_page_range(spec: str) -> slice:
    """Python-slice syntax over pages: "3", "1:5", "::2", "-1",
    "2:-1" etc.; a bare integer means that single page."""
    m = _RANGE_RE.match(spec.strip())
    if not m or spec.strip() == "":
        raise ValueError(f"invalid page range {spec!r}")
    start, stop, step = m.group("start"), m.group("stop"), m.group("step")
    if ":" not in spec:
        idx = int(start)
        return slice(idx, (idx + 1) if idx != -1 else None)
    return slice(
        int(start) if start else None,
        int(stop) if stop else None,
        int(step) if step else None,
    )


def page_indices(spec: str, n_pages: int) -> List[int]:
    return list(range(n_pages))[parse_page_range(spec)]


# ISO 216 / other standard page sizes in PDF points (parity:
# papersizes.py:8-48 — public constants)
PAPER_SIZES = {
    "A0": (2384, 3370), "A1": (1684, 2384), "A2": (1191, 1684),
    "A3": (842, 1191), "A4": (595, 842), "A5": (420, 595),
    "A6": (298, 420), "A7": (210, 298), "A8": (147, 210),
    "C4": (649, 918),
}


def scale_mediabox(box, sx: float, sy: Optional[float] = None):
    """Mediabox rescale under page scale (parity: PageObject.scale,
    _page.py:666-742 applies sx/sy to box corners)."""
    sy = sx if sy is None else sy
    llx, lly, urx, ury = (float(v) for v in box)
    return (llx * sx, lly * sy, urx * sx, ury * sy)
