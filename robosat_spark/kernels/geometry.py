"""Vector-geometry kernels: area, orientation, PIP, simplify, clip, IoU.

From-scratch NumPy replacements for the shapely/cv2 calls in the reference:
  * shoelace area / orientation  <- shapely ``polygon.orient`` + ``.area``
    (/root/reference/robosat/tools/merge.py:68-81)
  * point-in-polygon             <- shapely ``intersects`` refinement
    (/root/reference/robosat/tools/merge.py:52-55, dedupe.py:55-58)
  * Douglas-Peucker simplify     <- ``cv2.approxPolyDP``
    (/root/reference/robosat/features/core.py:112-124)
  * polygon clip + IoU           <- shapely ``intersection/union`` through an
    equal-area projection (/root/reference/robosat/spatial/core.py:56-77)

A polygon here is an (N, 2) float64 ndarray of vertices; rings may be open
or closed (first==last) — functions normalize as needed. A polygon-with-
holes is a list of rings, ring 0 exterior.
"""

from __future__ import annotations

import numpy as np

from .mercator import project_mollweide


def as_ring(ring) -> np.ndarray:
    """Coerce a ring from any nesting (list-of-lists, Arrow object ndarray
    of point ndarrays) into a dense (N, 2) float64 array."""
    if isinstance(ring, np.ndarray) and ring.dtype != object and ring.ndim == 2:
        return ring.astype(np.float64, copy=False)
    pts = [np.asarray(p, dtype=np.float64) for p in ring]
    if not pts:
        return np.zeros((0, 2), dtype=np.float64)
    return np.stack(pts)


def close_ring(ring: np.ndarray) -> np.ndarray:
    """Append the first point if the ring is not closed.

    Parity with /root/reference/robosat/features/core.py:59-61."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0 or np.array_equal(ring[0], ring[-1]):
        return ring
    return np.vstack([ring, ring[:1]])


def open_ring(ring: np.ndarray) -> np.ndarray:
    """Drop the duplicated closing point if present."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        return ring[:-1]
    return ring


def signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area; positive = counter-clockwise."""
    r = open_ring(ring)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def is_ccw(ring: np.ndarray) -> bool:
    return signed_area(ring) > 0.0


def orient(ring: np.ndarray, ccw: bool = True) -> np.ndarray:
    """Force ring winding. Parity with ``polygon.orient(sign=1.0)``
    (/root/reference/robosat/tools/merge.py:68-73)."""
    if is_ccw(ring) != ccw:
        return np.ascontiguousarray(ring[::-1])
    return np.asarray(ring, dtype=np.float64)


def ring_bbox(ring: np.ndarray):
    r = np.asarray(ring, dtype=np.float64)
    return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())


def bbox_intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd (crossing number) point-in-polygon test.

    Many points against one ring: O(P*E), evaluated in point blocks so the
    (block x edges) temporaries stay cache-resident instead of streaming
    P*E*8-byte matrices through DRAM — at 32 cores the unblocked form is
    memory-bandwidth-bound and stops scaling. A bbox pre-cull skips the
    edge loop for points that cannot be inside. Points exactly on an edge
    may land either side (consistent with shapely's boundary fuzz — the
    reference never relies on boundary points)."""
    r = open_ring(ring)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = px.shape[0]
    out = np.zeros(n, dtype=bool)
    if n == 0 or len(r) < 3:
        return out

    # bbox pre-cull (cheap O(P); the filter half of filter-refine)
    minx, miny = r[:, 0].min(), r[:, 1].min()
    maxx, maxy = r[:, 0].max(), r[:, 1].max()
    cand = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
    idx = np.nonzero(cand)[0]
    if idx.size == 0:
        return out

    x1 = r[:, 0][None, :]
    y1 = r[:, 1][None, :]
    x2 = np.roll(r[:, 0], -1)[None, :]
    y2 = np.roll(r[:, 1], -1)[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_dy = (x2 - x1) / (y2 - y1)

    block = 1024
    for s in range(0, idx.size, block):
        sel = idx[s : s + block]
        bx = px[sel][:, None]
        by = py[sel][:, None]
        straddle = (y1 > by) != (y2 > by)
        with np.errstate(invalid="ignore"):
            xint = x1 + (by - y1) * inv_dy
        crossings = np.sum(straddle & (bx < xint), axis=1)
        out[sel] = (crossings % 2) == 1
    return out


def points_in_polygon(px, py, rings) -> np.ndarray:
    """PIP for a polygon with holes: inside exterior, outside every hole."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def simplify_dp(ring: np.ndarray, epsilon: float, closed: bool = True) -> np.ndarray:
    """Douglas-Peucker polyline simplification, iterative stack form.

    Replaces ``cv2.approxPolyDP(contour, eps, closed=True)``
    (/root/reference/robosat/features/core.py:112-124, where
    eps = simplify * arcLength). For closed rings the input is treated as
    open vertex list; output is open (caller closes)."""
    pts = open_ring(ring) if closed else np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[j] - pts[i]
        seg_len = np.hypot(seg[0], seg[1])
        mid = pts[i + 1 : j]
        if seg_len < 1e-300:
            d = np.hypot(mid[:, 0] - pts[i][0], mid[:, 1] - pts[i][1])
        else:
            d = np.abs(np.cross(seg, mid - pts[i])) / seg_len
        k = int(np.argmax(d))
        if d[k] > epsilon:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    out = pts[keep]
    if closed and len(out) >= 2 and np.array_equal(out[0], out[-1]):
        out = out[:-1]
    return out


def arc_length(ring: np.ndarray, closed: bool = True) -> float:
    """Perimeter; matches ``cv2.arcLength(..., closed=True)`` semantics."""
    r = close_ring(ring) if closed else np.asarray(ring, dtype=np.float64)
    if len(r) < 2:
        return 0.0
    d = np.diff(r, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def segments_intersect(p1, p2, q1, q2) -> bool:
    """Proper/improper segment intersection via orientation tests."""

    def o(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-18 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) - 1e-18 <= c[0] <= max(a[0], b[0]) + 1e-18
            and min(a[1], b[1]) - 1e-18 <= c[1] <= max(a[1], b[1]) + 1e-18
        )

    o1, o2 = o(p1, p2, q1), o(p1, p2, q2)
    o3, o4 = o(q1, q2, p1), o(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, q1):
        return True
    if o2 == 0 and on_seg(p1, p2, q2):
        return True
    if o3 == 0 and on_seg(q1, q2, p1):
        return True
    if o4 == 0 and on_seg(q1, q2, p2):
        return True
    return False


def rings_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Exact polygon-intersects test (edge crossing or containment).

    The refine step of the filter-refine spatial join
    (/root/reference/robosat/tools/merge.py:52-55). Vectorized edge-pair
    straddle test, falling back to containment checks."""
    ra, rb = open_ring(a), open_ring(b)
    if len(ra) < 3 or len(rb) < 3:
        return False
    if not bbox_intersects(ring_bbox(ra), ring_bbox(rb)):
        return False
    a1 = ra
    a2 = np.roll(ra, -1, axis=0)
    b1 = rb
    b2 = np.roll(rb, -1, axis=0)
    # cross((a2-a1), (q-a1)) sign for every (edgeA, pointB) pair
    def cross_sign(p1, p2, q):
        d = p2 - p1  # (E,2)
        v = q[None, :, :] - p1[:, None, :]  # (E,Q,2)
        return d[:, None, 0] * v[:, :, 1] - d[:, None, 1] * v[:, :, 0]

    sa_b1 = cross_sign(a1, a2, b1)
    sa_b2 = cross_sign(a1, a2, b2)
    sb_a1 = cross_sign(b1, b2, a1)
    sb_a2 = cross_sign(b1, b2, a2)
    straddleA = (sa_b1 * sa_b2) < 0  # (Ea, Eb): edgeB endpoints straddle edgeA line
    straddleB = (sb_a1 * sb_a2) < 0  # (Eb, Ea)
    if np.any(straddleA & straddleB.T):
        return True
    # No proper crossing: containment (either fully inside the other).
    if points_in_ring(ra[:1, 0], ra[:1, 1], rb)[0]:
        return True
    if points_in_ring(rb[:1, 0], rb[:1, 1], ra)[0]:
        return True
    return False


def clip_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip (possibly concave) subject by CONVEX clipper."""
    clipper = orient(open_ring(clipper), ccw=True)
    output = open_ring(subject)
    nc = len(clipper)
    for i in range(nc):
        if len(output) == 0:
            break
        a = clipper[i]
        b = clipper[(i + 1) % nc]
        edge = b - a
        inp = output
        prev = np.roll(inp, 1, axis=0)
        side = edge[0] * (inp[:, 1] - a[1]) - edge[1] * (inp[:, 0] - a[0])
        side_prev = edge[0] * (prev[:, 1] - a[1]) - edge[1] * (prev[:, 0] - a[0])
        new_pts = []
        for j in range(len(inp)):
            cur_in = side[j] >= 0
            prev_in = side_prev[j] >= 0
            if cur_in != prev_in:
                p0, p1 = prev[j], inp[j]
                denom = side[j] - side_prev[j]
                t = -side_prev[j] / denom if abs(denom) > 1e-300 else 0.0
                new_pts.append(p0 + t * (p1 - p0))
            if cur_in:
                new_pts.append(inp[j])
        output = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return output


def is_convex(ring) -> bool:
    """True iff the ring is convex (all edge-turn cross products share a
    sign; collinear vertices allowed). Degenerate rings (<3 distinct
    points) are not convex."""
    r = open_ring(as_ring(ring))
    if len(r) < 3:
        return False
    e = np.roll(r, -1, axis=0) - r
    e2 = np.roll(e, -1, axis=0)
    cross = e[:, 0] * e2[:, 1] - e[:, 1] * e2[:, 0]
    return not (np.any(cross > 0.0) and np.any(cross < 0.0))


def convex_iou(ring_a, ring_b) -> float:
    """EXACT IoU of two CONVEX rings: Sutherland-Hodgman clip + shoelace,
    in the same equal-area Mollweide domain as :func:`raster_iou` (parity
    with the reference's project-then-area chain,
    /root/reference/robosat/spatial/core.py:56-77). Exact arithmetic — no
    sampling grid, no quantization — so near-threshold dedupe verdicts
    (keep/drop at 0.5) are stable. Used by operators.dedupe as the fast
    path when exactly one convex candidate intersects; raster_iou_multi
    remains the general-polygon fallback (cross-checked within 0.02 in
    tests/test_kernels_geometry.py)."""
    a = open_ring(as_ring(ring_a))
    b = open_ring(as_ring(ring_b))
    if len(a) < 3 or len(b) < 3:
        return 0.0

    def proj(r):
        x, y = project_mollweide(r[:, 0], r[:, 1])
        return np.column_stack([x, y])

    pa, pb = proj(a), proj(b)
    # local origin: projected coords are ~1e7 m while areas are tiny —
    # without recentering the shoelace loses ~8 digits to cancellation
    origin = pa.mean(axis=0)
    pa = pa - origin
    pb = pb - origin
    area_a = abs(signed_area(pa))
    area_b = abs(signed_area(pb))
    inter_ring = clip_convex(pa, pb)
    inter = abs(signed_area(inter_ring)) if len(inter_ring) >= 3 else 0.0
    union = area_a + area_b - inter
    if union <= 0.0:
        return 0.0
    iou = inter / union
    assert -1e-12 <= iou <= 1.0 + 1e-12
    return float(min(max(iou, 0.0), 1.0))


def _point_in_tri_inclusive(p, a, b, c) -> bool:
    """Barycentric-sign containment, edges inclusive (used to BLOCK ears,
    so on-edge counts as inside)."""
    d1 = (p[0] - b[0]) * (a[1] - b[1]) - (a[0] - b[0]) * (p[1] - b[1])
    d2 = (p[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (p[1] - c[1])
    d3 = (p[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (p[1] - a[1])
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def triangulate(ring) -> list | None:
    """Ear-clipping triangulation of a SIMPLE ring (no self-intersection;
    concave fine) -> list of (3, 2) triangle arrays partitioning the
    polygon, or None if the clipper deadlocks on a degenerate input
    (caller falls back to the raster path). O(n²) — rings here are
    simplified contours, tens of vertices."""
    r = orient(open_ring(as_ring(ring)), ccw=True)
    if len(r) < 3:
        return None
    idx = list(range(len(r)))
    tris = []
    while len(idx) > 3:
        n = len(idx)
        for ii in range(n):
            i0, i1, i2 = idx[(ii - 1) % n], idx[ii], idx[(ii + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross <= 0.0:  # reflex or collinear corner: not an ear
                continue
            if any(
                _point_in_tri_inclusive(r[j], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append(np.array([a, b, c]))
            idx.pop(ii)
            break
        else:
            return None  # no ear found: degenerate geometry
    tris.append(r[idx])
    return tris


def intersection_area(ring_a, ring_b) -> float | None:
    """EXACT area of the intersection of two SIMPLE rings (either may be
    concave): triangulate B into a partition, clip A by each (convex)
    triangle with Sutherland-Hodgman, sum the clipped areas. Exact
    arithmetic — the partition makes per-triangle intersections disjoint,
    and a convex clipper keeps SH exact even for a concave subject.
    Returns None when triangulation deadlocks (caller falls back to
    raster)."""
    a = orient(open_ring(as_ring(ring_a)), ccw=True)
    b = open_ring(as_ring(ring_b))
    if len(a) < 3 or len(b) < 3:
        return 0.0
    tris = triangulate(b)
    if tris is None:
        return None
    total = 0.0
    for tri in tris:
        out = clip_convex(a, tri)
        if len(out) >= 3:
            total += max(signed_area(out), 0.0)
    return total


def exact_iou(rings_a, rings_b) -> float | None:
    """EXACT IoU of two simple polygons-with-holes in the equal-area
    Mollweide domain (same projection as :func:`raster_iou` — reference
    parity with robosat/spatial/core.py:56-77). Hole handling is
    inclusion-exclusion: |A∩B| = |eA∩eB| - Σ|eA∩hB| - Σ|hA∩eB| + Σ|hA∩hB|
    (holes lie inside their exteriors and are disjoint — the contour
    tracer guarantees that shape). Returns None on degenerate
    triangulation; callers fall back to the supersampled raster IoU
    (cross-checked within 0.02 in tests)."""

    def proj(rings):
        out = []
        for r in rings:
            r = open_ring(as_ring(r))
            if len(r) < 3:
                continue
            x, y = project_mollweide(r[:, 0], r[:, 1])
            out.append(np.column_stack([x, y]))
        return out

    pa, pb = proj(rings_a), proj(rings_b)
    if not pa or not pb:
        return 0.0
    # recenter on a shared local origin (see convex_iou: shoelace on ~1e7 m
    # coordinates with ~1e4 m² areas cancels catastrophically)
    origin = pa[0].mean(axis=0)
    pa = [r - origin for r in pa]
    pb = [r - origin for r in pb]

    def inter(sa, sb, sign):
        tot = 0.0
        for ra in sa:
            for rb in sb:
                v = intersection_area(ra, rb)
                if v is None:
                    return None
                tot += v
        return sign * tot

    terms = [
        inter(pa[:1], pb[:1], 1.0),
        inter(pa[:1], pb[1:], -1.0),
        inter(pa[1:], pb[:1], -1.0),
        inter(pa[1:], pb[1:], 1.0),
    ]
    if any(t is None for t in terms):
        return None
    inter_area = sum(terms)
    area_a = abs(signed_area(pa[0])) - sum(abs(signed_area(h)) for h in pa[1:])
    area_b = abs(signed_area(pb[0])) - sum(abs(signed_area(h)) for h in pb[1:])
    union = area_a + area_b - inter_area
    if union <= 0.0:
        return 0.0
    iou = inter_area / union
    assert -1e-9 <= iou <= 1.0 + 1e-9, iou
    return float(min(max(iou, 0.0), 1.0))


def raster_iou(rings_a, rings_b, resolution: int = 512) -> float:
    """IoU of two polygons-with-holes via supersampled grid in Mollweide.

    General-polygon ``intersection.area / union.area`` replacement for
    /root/reference/robosat/spatial/core.py:56-77 (which projects through an
    equal-area CRS first — we project to Mollweide the same way). Bounded
    error ~ O(1/resolution); the reference only thresholds IoU and asserts
    it lies in [0, 1], so bounded error is acceptable (SURVEY.md §7)."""

    def proj(rings):
        out = []
        for r in rings:
            r = open_ring(np.asarray(r, dtype=np.float64))
            x, y = project_mollweide(r[:, 0], r[:, 1])
            out.append(np.column_stack([x, y]))
        return out

    pa = [r for r in proj(rings_a) if len(r) >= 3]
    pb = [r for r in proj(rings_b) if len(r) >= 3]
    if not pa or not pb:
        return 0.0
    boxes = [ring_bbox(r) for r in (pa[:1] + pb[:1])]
    minx = min(b[0] for b in boxes)
    miny = min(b[1] for b in boxes)
    maxx = max(b[2] for b in boxes)
    maxy = max(b[3] for b in boxes)
    if maxx <= minx or maxy <= miny:
        return 0.0
    # Pixel-center sample grid over the union bbox.
    xs = np.linspace(minx, maxx, resolution, endpoint=False) + (maxx - minx) / resolution / 2
    ys = np.linspace(miny, maxy, resolution, endpoint=False) + (maxy - miny) / resolution / 2
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    in_a = points_in_polygon(gx, gy, pa)
    in_b = points_in_polygon(gx, gy, pb)
    union = np.count_nonzero(in_a | in_b)
    if union == 0:
        return 0.0
    inter = np.count_nonzero(in_a & in_b)
    iou = inter / union
    assert 0.0 <= iou <= 1.0  # invariant from /root/reference/robosat/spatial/core.py:75
    return float(iou)


def raster_iou_multi(polys_a, polys_b, resolution: int = 512) -> float:
    """IoU between two *sets* of polygons-with-holes (each side a union).

    Generalizes :func:`raster_iou` for the dedupe join's union-of-matches
    (/root/reference/robosat/tools/dedupe.py:61: union of intersecting OSM
    shapes before a single IoU)."""

    def proj_all(polys):
        out = []
        for rings in polys:
            pr = []
            for r in rings:
                r = open_ring(as_ring(r))
                if len(r) < 3:
                    continue
                x, y = project_mollweide(r[:, 0], r[:, 1])
                pr.append(np.column_stack([x, y]))
            if pr:
                out.append(pr)
        return out

    pa, pb = proj_all(polys_a), proj_all(polys_b)
    if not pa or not pb:
        return 0.0
    allr = [p[0] for p in pa] + [p[0] for p in pb]
    minx = min(ring_bbox(r)[0] for r in allr)
    miny = min(ring_bbox(r)[1] for r in allr)
    maxx = max(ring_bbox(r)[2] for r in allr)
    maxy = max(ring_bbox(r)[3] for r in allr)
    if maxx <= minx or maxy <= miny:
        return 0.0
    xs = np.linspace(minx, maxx, resolution, endpoint=False) + (maxx - minx) / resolution / 2
    ys = np.linspace(miny, maxy, resolution, endpoint=False) + (maxy - miny) / resolution / 2
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()

    def union_mask(polys):
        m = np.zeros(gx.shape[0], dtype=bool)
        for rings in polys:
            m |= points_in_polygon(gx, gy, rings)
        return m

    in_a, in_b = union_mask(pa), union_mask(pb)
    union = np.count_nonzero(in_a | in_b)
    if union == 0:
        return 0.0
    iou = np.count_nonzero(in_a & in_b) / union
    assert 0.0 <= iou <= 1.0
    return float(iou)


def polygon_area_m2(ring: np.ndarray) -> float:
    """Equal-area (Mollweide) polygon area in m², rounded like the reference.

    Parity with /root/reference/robosat/tools/merge.py:78-81 (shapely area
    in an equal-area projection, ``int(round(area))`` property)."""
    r = open_ring(np.asarray(ring, dtype=np.float64))
    x, y = project_mollweide(r[:, 0], r[:, 1])
    return abs(signed_area(np.column_stack([x, y])))
