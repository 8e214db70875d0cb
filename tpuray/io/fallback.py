"""Pure-numpy fallbacks for every native entry point.

These double as *oracles*: tests assert the C++ implementations produce
identical output. Algorithms match tpuray/native/tpuray_native.cpp.
"""
from __future__ import annotations

import re

import numpy as np


# --------------------------- OBJ ------------------------------------------

def parse_obj_py(path: str):
    positions, texcoords, face_v, face_vt = [], [], [], []
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v" and len(parts) >= 4:
                positions.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif parts[0] == "vt" and len(parts) >= 3:
                texcoords.append([float(parts[1]), float(parts[2])])
            elif parts[0] == "f" and len(parts) >= 4:
                vi, ti = [], []
                for tok in parts[1:4]:
                    sub = tok.split("/")
                    vi.append(int(sub[0]) - 1)
                    if len(sub) >= 2 and sub[1]:
                        ti.append(int(sub[1]) - 1)
                    else:
                        ti.append(-1)
                face_v.append(vi)
                face_vt.append(ti)
    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    uv = np.asarray(texcoords, np.float32).reshape(-1, 2)
    fv = np.asarray(face_v, np.int32).reshape(-1, 3)
    fvt = np.asarray(face_vt, np.int32).reshape(-1, 3)
    return pos, uv, fv, fvt


# --------------------------- RGBE .hdr -------------------------------------

def read_hdr_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise IOError("not a radiance file")
    # skip header
    pos = data.index(b"\n") + 1
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line.strip() == b"":
            break
    eol = data.index(b"\n", pos)
    m = re.match(rb"-Y (\d+) \+X (\d+)", data[pos:eol])
    if not m:
        raise IOError("unsupported resolution line")
    h, w = int(m.group(1)), int(m.group(2))
    pos = eol + 1
    out = np.zeros((h, w, 4), np.uint8)
    for y in range(h):
        head = data[pos:pos + 4]
        if len(head) < 4:
            raise IOError("truncated")
        if head[0] == 2 and head[1] == 2 and ((head[2] << 8) | head[3]) == w and w >= 8:
            pos += 4
            scan = np.zeros((w, 4), np.uint8)
            for c in range(4):
                x = 0
                while x < w:
                    code = data[pos]; pos += 1
                    if code > 128:
                        n = code - 128
                        scan[x:x + n, c] = data[pos]; pos += 1
                        x += n
                    else:
                        n = code
                        scan[x:x + n, c] = np.frombuffer(data[pos:pos + n], np.uint8)
                        pos += n
                        x += n
            out[y] = scan
        else:
            x = 0
            shift = 0
            while x < w:
                px = np.frombuffer(data[pos:pos + 4], np.uint8); pos += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1:
                    n = int(px[3]) << shift
                    out[y, x:x + n] = out[y, x - 1]
                    x += n
                    shift += 8
                else:
                    out[y, x] = px
                    x += 1
                    shift = 0
    rgb = out[..., :3].astype(np.float32)
    exp = out[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(np.float32(1.0), exp - 136)).astype(np.float32)
    return rgb * scale[..., None]


def write_hdr_py(path: str, rgb: np.ndarray) -> None:
    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    m = rgb.max(axis=-1)
    mant, exp = np.frexp(m)
    scale = np.where(m >= 1e-32, mant * 256.0 / np.maximum(m, 1e-38), 0.0)
    e = np.zeros((h, w, 4), np.uint8)
    e[..., :3] = np.minimum(255.0, rgb * scale[..., None]).astype(np.uint8)
    e[..., 3] = np.where(m >= 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(e.tobytes())


# --------------------------- BMP -------------------------------------------

def read_bmp_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise IOError("not a BMP")
    data_off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp not in (24, 32) or comp != 0:
        raise IOError("unsupported BMP")
    topdown = h < 0
    h = abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    rows = np.frombuffer(data[data_off:data_off + stride * h], np.uint8)
    rows = rows.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
    if not topdown:
        rows = rows[::-1]
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[..., 0] = rows[..., 2]
    rgba[..., 1] = rows[..., 1]
    rgba[..., 2] = rows[..., 0]
    rgba[..., 3] = rows[..., 3] if bypp == 4 else 255
    return rgba


def write_bmp_py(path: str, rgb: np.ndarray) -> None:
    """Write an uncompressed 24-bit bottom-up BMP (for test fixtures)."""
    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    img = np.zeros((h, stride), np.uint8)
    bgr = rgb[::-1][..., ::-1]  # bottom-up, BGR
    img[:, : w * 3] = bgr.reshape(h, w * 3)
    data_size = stride * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + data_size).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(img.tobytes())


# --------------------------- BVH -------------------------------------------

def build_bvh_py(tri_verts: np.ndarray, leaf_size: int = 8) -> dict:
    """Sweep-SAH threaded BVH; bit-identical layout to the C++ builder."""
    v = np.asarray(tri_verts, np.float32).reshape(-1, 3, 3)
    t = v.shape[0]
    cmin = v.min(axis=1)  # (T,3)
    cmax = v.max(axis=1)
    centroid = v.mean(axis=1, dtype=np.float32)

    aabb_min, aabb_max = [], []
    first_tri, tri_count = [], []
    perm = np.arange(t, dtype=np.int32)

    def surface_area(mn, mx):
        d = mx - mn
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])

    def build(lo, hi):  # half-open [lo, hi)
        node_id = len(first_tri)
        idx = perm[lo:hi]
        aabb_min.append(cmin[idx].min(axis=0))
        aabb_max.append(cmax[idx].max(axis=0))
        n = hi - lo
        if n <= leaf_size:
            first_tri.append(lo)
            tri_count.append(n)
            return
        first_tri.append(0)
        tri_count.append(0)

        best = (np.inf, -1, 0, None)
        for axis in range(3):
            order = idx[np.argsort(centroid[idx, axis], kind="stable")]
            pre_min = np.minimum.accumulate(cmin[order], axis=0)
            pre_max = np.maximum.accumulate(cmax[order], axis=0)
            suf_min = np.minimum.accumulate(cmin[order][::-1], axis=0)[::-1]
            suf_max = np.maximum.accumulate(cmax[order][::-1], axis=0)[::-1]
            counts = np.arange(1, n, dtype=np.float32)
            cost = (surface_area(pre_min[:-1], pre_max[:-1]) * counts
                    + surface_area(suf_min[1:], suf_max[1:]) * counts[::-1])
            i = int(np.argmin(cost))
            if cost[i] < best[0]:
                best = (float(cost[i]), axis, i, order)
        _, _, i, order = best
        perm[lo:hi] = order
        build(lo, lo + i + 1)
        build(lo + i + 1, hi)

    if t > 0:
        import sys
        old_limit = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old_limit, 10000 + t))
        try:
            build(0, t)
        finally:
            sys.setrecursionlimit(old_limit)

    n_nodes = len(first_tri)
    tri_count_a = np.asarray(tri_count, np.int32)
    # skip links from subtree extents (forward pass, same as native)
    end = np.zeros(n_nodes, np.int64)
    st: list[list[int]] = []
    for i in range(n_nodes):
        if tri_count_a[i] == 0:
            st.append([i, 0])
        else:
            end[i] = i + 1
            last_end = end[i]
            while st:
                st[-1][1] += 1
                if st[-1][1] == 2:
                    node = st.pop()[0]
                    end[node] = last_end
                    last_end = end[node]
                else:
                    break
    return dict(
        aabb_min=np.asarray(aabb_min, np.float32).reshape(n_nodes, 3),
        aabb_max=np.asarray(aabb_max, np.float32).reshape(n_nodes, 3),
        first_tri=np.asarray(first_tri, np.int32),
        tri_count=tri_count_a,
        skip=end.astype(np.int32),
        perm=perm,
    )


# --------------------------- env cache --------------------------------------

def env_cache_py(rgb: np.ndarray) -> np.ndarray:
    """(sample_x, sample_y, pdf) cache; float64 internals like the native path."""
    rgb = np.asarray(rgb, np.float64)
    h, w = rgb.shape[:2]
    lum = 0.2 * rgb[..., 0] + 0.7 * rgb[..., 1] + 0.1 * rgb[..., 2]
    total = lum.sum()
    if total <= 0:
        raise ValueError("zero-luminance envmap")
    pdf = lum / total
    pdf_x = pdf.sum(axis=0)  # (w,)
    cdf_x = np.cumsum(pdf_x)
    denom = np.where(pdf_x > 0, pdf_x, 1.0)
    cdf_y = np.cumsum(pdf / denom[None, :], axis=0)  # (h, w)

    xi_1 = np.arange(h, dtype=np.float64) / h
    x = np.minimum(np.searchsorted(cdf_x, xi_1, side="left"), w - 1)  # (h,)
    xi_2 = np.arange(w, dtype=np.float64) / w
    # y[i, j] = lower_bound(cdf_y[:, x[i]], xi_2[j])
    cols = cdf_y[:, x]  # (h_rows=h?, cols over i) -> shape (h, h_i)
    y = np.empty((h, w), np.int64)
    for i in range(h):
        y[i] = np.searchsorted(cols[:, i], xi_2, side="left")
    y = np.minimum(y, h - 1)
    cache = np.empty((h, w, 3), np.float32)
    cache[..., 0] = (x[:, None].astype(np.float64) / w).astype(np.float32)
    cache[..., 1] = (y.astype(np.float64) / h).astype(np.float32)
    cache[..., 2] = pdf.astype(np.float32)
    return cache
