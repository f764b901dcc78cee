"""Page geometry: bounding boxes and their algebra.

From-scratch re-expression of the reference's ``BoundingBox``/``Size``
(types/doc/base.py:43-462) as a plain-slots class - the ~25 float
methods (areas, overlaps, IoU, origin flips, scaling, enclosing union)
with identical semantics, parity-tested against the live reference on
randomized boxes. Also TB7, the table row/column bbox aggregation
(document.py:566-677).

For bulk geometry over DataFrames the same formulas are exposed as
Spark column builders (``iou_col`` etc.) operating on
``struct<l,t,r,b>`` columns - pure JVM expressions, no UDF.

Coordinate conventions: TOPLEFT means t <= b on the page; BOTTOMLEFT
means b <= t. Mixed-origin binary ops raise ValueError, like the
reference.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

TOPLEFT = "TOPLEFT"
BOTTOMLEFT = "BOTTOMLEFT"


class Size:
    __slots__ = ("width", "height")

    def __init__(self, width: float = 0.0, height: float = 0.0) -> None:
        self.width = width
        self.height = height

    def as_tuple(self) -> Tuple[float, float]:
        return (self.width, self.height)


class BBox:
    """BoundingBox analogue (types/doc/base.py:58-462)."""

    __slots__ = ("l", "t", "r", "b", "coord_origin")

    def __init__(self, l: float, t: float, r: float, b: float,
                 coord_origin: str = TOPLEFT) -> None:
        self.l, self.t, self.r, self.b = (float(l), float(t), float(r),
                                          float(b))
        self.coord_origin = coord_origin

    # --- basic ---------------------------------------------------------
    @property
    def width(self) -> float:
        return self.r - self.l

    @property
    def height(self) -> float:
        return abs(self.t - self.b)

    def as_tuple(self) -> Tuple[float, float, float, float]:
        # BOTTOMLEFT flips to (l, b, r, t) like the reference
        if self.coord_origin == BOTTOMLEFT:
            return (self.l, self.b, self.r, self.t)
        return (self.l, self.t, self.r, self.b)

    @classmethod
    def from_tuple(cls, coord: Tuple[float, ...], origin: str) -> "BBox":
        if origin == TOPLEFT:
            l, t, r, b = coord[0], coord[1], coord[2], coord[3]
            if r < l:
                l, r = r, l
            if b < t:
                b, t = t, b
        else:
            l, b, r, t = coord[0], coord[1], coord[2], coord[3]
            if r < l:
                l, r = r, l
            if b > t:
                b, t = t, b
        return cls(l=l, t=t, r=r, b=b, coord_origin=origin)

    def area(self) -> float:
        return abs(self.r - self.l) * abs(self.b - self.t)

    def _require_same_origin(self, other: "BBox") -> None:
        if self.coord_origin != other.coord_origin:
            raise ValueError("BoundingBoxes have different CoordOrigin")

    # --- scaling -------------------------------------------------------
    def resize_by_scale(self, x_scale: float, y_scale: float) -> "BBox":
        return BBox(self.l * x_scale, self.t * y_scale,
                    self.r * x_scale, self.b * y_scale,
                    self.coord_origin)

    def scale_to_size(self, old_size: Size, new_size: Size) -> "BBox":
        return self.resize_by_scale(new_size.width / old_size.width,
                                    new_size.height / old_size.height)

    def scaled(self, scale: float) -> "BBox":
        return self.resize_by_scale(scale, scale)

    def normalized(self, page_size: Size) -> "BBox":
        return self.scale_to_size(page_size, Size(1.0, 1.0))

    def expand_by_scale(self, x_scale: float, y_scale: float) -> "BBox":
        dw, dh = self.width * x_scale, self.height * y_scale
        if self.coord_origin == TOPLEFT:
            return BBox(self.l - dw, self.t - dh, self.r + dw,
                        self.b + dh, self.coord_origin)
        return BBox(self.l - dw, self.t + dh, self.r + dw,
                    self.b - dh, self.coord_origin)

    # --- intersections / unions ---------------------------------------
    def intersection_area_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        left = max(self.l, other.l)
        right = min(self.r, other.r)
        if self.coord_origin == TOPLEFT:
            bottom, top = max(self.t, other.t), min(self.b, other.b)
        else:
            top, bottom = min(self.t, other.t), max(self.b, other.b)
        w, h = right - left, top - bottom
        if w <= 0 or h <= 0:
            return 0.0
        return w * h

    def intersection_over_union(self, other: "BBox",
                                eps: float = 1.0e-6) -> float:
        inter = self.intersection_area_with(other)
        union = self.area() + other.area() - inter
        return inter / (union + eps)

    def intersection_over_self(self, other: "BBox",
                               eps: float = 1.0e-6) -> float:
        inter = self.intersection_area_with(other)
        return inter / self.area() if self.area() > 0 else 0.0

    def union_area_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        return self.area() + other.area() - self.intersection_area_with(
            other)

    def x_overlap_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        return max(0.0, min(self.r, other.r) - max(self.l, other.l))

    def y_overlap_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        if self.coord_origin == TOPLEFT:
            return max(0.0, min(self.b, other.b) - max(self.t, other.t))
        return max(0.0, min(self.t, other.t) - max(self.b, other.b))

    def x_union_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        return max(0.0, max(self.r, other.r) - min(self.l, other.l))

    def y_union_with(self, other: "BBox") -> float:
        self._require_same_origin(other)
        if self.coord_origin == TOPLEFT:
            return max(0.0, max(self.b, other.b) - min(self.t, other.t))
        return max(0.0, max(self.t, other.t) - min(self.b, other.b))

    # --- origin flips --------------------------------------------------
    def to_bottom_left_origin(self, page_height: float) -> "BBox":
        if self.coord_origin == BOTTOMLEFT:
            return BBox(self.l, self.t, self.r, self.b, BOTTOMLEFT)
        return BBox(self.l, page_height - self.t, self.r,
                    page_height - self.b, BOTTOMLEFT)

    def to_top_left_origin(self, page_height: float) -> "BBox":
        if self.coord_origin == TOPLEFT:
            return BBox(self.l, self.t, self.r, self.b, TOPLEFT)
        return BBox(self.l, page_height - self.t, self.r,
                    page_height - self.b, TOPLEFT)

    # --- predicates ----------------------------------------------------
    def overlaps(self, other: "BBox") -> bool:
        return (self.overlaps_horizontally(other)
                and self.overlaps_vertically(other))

    def overlaps_horizontally(self, other: "BBox") -> bool:
        return not (self.r <= other.l or other.r <= self.l)

    def overlaps_vertically(self, other: "BBox") -> bool:
        self._require_same_origin(other)
        if self.coord_origin == BOTTOMLEFT:
            return not (self.t <= other.b or other.t <= self.b)
        return not (self.b <= other.t or other.b <= self.t)

    def overlaps_vertically_with_iou(self, other: "BBox",
                                     iou: float) -> bool:
        self._require_same_origin(other)
        if not self.overlaps_vertically(other):
            return False
        if self.coord_origin == BOTTOMLEFT:
            u0, u1 = min(self.b, other.b), max(self.t, other.t)
            i0, i1 = max(self.b, other.b), min(self.t, other.t)
        else:
            u0, u1 = min(self.t, other.t), max(self.b, other.b)
            i0, i1 = max(self.t, other.t), min(self.b, other.b)
        return (i1 - i0) / (u1 - u0) > iou

    def is_left_of(self, other: "BBox") -> bool:
        return self.l < other.l

    def is_strictly_left_of(self, other: "BBox",
                            eps: float = 0.001) -> bool:
        return (self.r + eps) < other.l

    def is_above(self, other: "BBox") -> bool:
        self._require_same_origin(other)
        if self.coord_origin == BOTTOMLEFT:
            return self.t > other.t
        return self.t < other.t

    def is_strictly_above(self, other: "BBox",
                          eps: float = 1.0e-3) -> bool:
        self._require_same_origin(other)
        if self.coord_origin == BOTTOMLEFT:
            return (self.b + eps) > other.t
        return (self.b + eps) < other.t

    def is_horizontally_connected(self, elem_i: "BBox",
                                  elem_j: "BBox") -> bool:
        self._require_same_origin(elem_i)
        self._require_same_origin(elem_j)
        if self.coord_origin == BOTTOMLEFT:
            min_ij, max_ij = min(elem_i.b, elem_j.b), max(elem_i.t,
                                                          elem_j.t)
            if self.b < max_ij and min_ij < self.t:
                return False
        else:
            min_ij, max_ij = min(elem_i.t, elem_j.t), max(elem_i.b,
                                                          elem_j.b)
            if self.t < max_ij and min_ij < self.b:
                return False
        return self.l < elem_i.r and elem_j.l < self.r

    @classmethod
    def enclosing_bbox(cls, boxes: List["BBox"]) -> "BBox":
        if not boxes:
            raise ValueError("No bounding boxes provided for union.")
        origin = boxes[0].coord_origin
        if any(b.coord_origin != origin for b in boxes):
            raise ValueError("All bounding boxes must have the same "
                             "CoordOrigin to compute their union.")
        left = min(b.l for b in boxes)
        right = max(b.r for b in boxes)
        if origin == TOPLEFT:
            top = min(b.t for b in boxes)
            bottom = max(b.b for b in boxes)
        else:
            top = max(b.t for b in boxes)
            bottom = min(b.b for b in boxes)
        return cls(left, top, right, bottom, origin)


# ----------------------------------------------------------------------
# TB7: table row/column bbox aggregation (document.py:566-677)
# ----------------------------------------------------------------------

def _axis_bboxes(cells, axis: str, n: int) -> dict:
    """Shared row/col logic: per index, enclose the bboxes of the
    cells with the smallest span on that axis, then widen l/r (rows) or
    t/b (cols) with every cell's extent - exactly the reference's
    min-span enclosure."""
    out: dict = {}
    origins = {c["bbox"].coord_origin for c in cells
               if c.get("bbox") is not None}
    if len(origins) > 1:
        raise ValueError("All bounding boxes must have the same "
                         "CoordOrigin to compute their union.")
    for idx in range(n):
        by_span: dict = {}
        for c in cells:
            bbox = c.get("bbox")
            if bbox is None:
                continue
            s, e = (c["sr"], c["er"]) if axis == "row" else (c["sc"],
                                                             c["ec"])
            if s <= idx < e:
                by_span.setdefault(e - s, []).append(bbox)
        if not by_span:
            continue
        enclosing = BBox.enclosing_bbox(by_span[min(by_span)])
        for boxes in by_span.values():
            for bbox in boxes:
                if axis == "row":
                    enclosing.l = min(enclosing.l, bbox.l)
                    enclosing.r = max(enclosing.r, bbox.r)
                else:
                    if enclosing.coord_origin == TOPLEFT:
                        enclosing.t = min(enclosing.t, bbox.t)
                        enclosing.b = max(enclosing.b, bbox.b)
                    else:
                        enclosing.t = max(enclosing.t, bbox.t)
                        enclosing.b = min(enclosing.b, bbox.b)
        out[idx] = enclosing
    return out


def row_bounding_boxes(cells: List[dict], num_rows: int) -> dict:
    """cells: [{"bbox": BBox|None, "sr","er","sc","ec"}]."""
    return _axis_bboxes(cells, "row", num_rows)


def column_bounding_boxes(cells: List[dict], num_cols: int) -> dict:
    return _axis_bboxes(cells, "col", num_cols)


# ----------------------------------------------------------------------
# Spark column builders over struct<l,t,r,b> (TOPLEFT) columns
# ----------------------------------------------------------------------

def area_col(b):
    from pyspark.sql import functions as F
    return F.abs(b["r"] - b["l"]) * F.abs(b["b"] - b["t"])


def intersection_area_col(a, b):
    from pyspark.sql import functions as F
    w = F.least(a["r"], b["r"]) - F.greatest(a["l"], b["l"])
    h = F.least(a["b"], b["b"]) - F.greatest(a["t"], b["t"])
    return F.when((w > 0) & (h > 0), w * h).otherwise(F.lit(0.0))


def iou_col(a, b, eps: float = 1.0e-6):
    inter = intersection_area_col(a, b)
    return inter / (area_col(a) + area_col(b) - inter + eps)


def overlaps_col(a, b):
    return ((a["r"] > b["l"]) & (b["r"] > a["l"])
            & (a["b"] > b["t"]) & (b["b"] > a["t"]))
