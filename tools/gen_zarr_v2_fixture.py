#!/usr/bin/env python3
"""Independent Zarr v2 fixture generator (spec-from-scratch, stdlib only).

Writes two v2 stores under src/test/resources/ following the Zarr v2 spec
(https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html) with ONLY
json/struct/zlib — no zarr-python, no numcodecs, and none of the repo's
own encoders — so the Scala reader is validated against a second,
independent implementation of the format.

Store 1: zarr_v2_2d  — shape (5,7), chunks (3,4) (edge chunks):
  temp     <f8  zlib(6)  order C   fill 99.5, chunk (1,1) ABSENT
  counts   <i4  zlib(6)  order F   fill 0
  pressure >f4  raw      order C   fill null  (big endian)
Store 2: zarr_v2_1d  — shape (11,), chunks (4,):
  flag     |b1  raw      fill false
  u8       |u1  raw      fill 0         values 245+i (uint8 > 127 range)
  id64     <i8  zlib(6)  dimension_separator "/"   values 10^12 + i
  plus .zmetadata consolidated doc over all three arrays.

Values are closed-form (asserted by ZarrV2Spec):
  temp[i][j] = 10*i + j + 0.5   counts[i][j] = 100*i + j
  pressure[i][j] = 0.25*(7*i + j)
"""
import json
import os
import shutil
import struct
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
RES = os.path.join(HERE, "..", "src", "test", "resources")


def chunk_bytes(values_2d, chunk_shape, ci, cj, shape, fmt, order, fill):
    """Full-size (padded) chunk in C or F order, packed with struct fmt."""
    ch, cw = chunk_shape
    flat = []
    idx = []
    for i in range(ch):
        row = []
        for j in range(cw):
            gi, gj = ci * ch + i, cj * cw + j
            if gi < shape[0] and gj < shape[1]:
                row.append(values_2d[gi][gj])
            else:
                row.append(fill)
        idx.append(row)
    if order == "F":
        for j in range(cw):
            for i in range(ch):
                flat.append(idx[i][j])
    else:
        for i in range(ch):
            for j in range(cw):
                flat.append(idx[i][j])
    return struct.pack(fmt % len(flat), *flat)


def write_array_2d(root, name, values, dtype, fmt, compressor, order,
                   fill_json, fill_pad, shape, chunks, skip=(), dims=None):
    d = os.path.join(root, name)
    os.makedirs(d)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": fill_json,
        "order": order,
        "filters": None,
    }
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    if dims:
        with open(os.path.join(d, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": dims}, f)
    n_ci = (shape[0] + chunks[0] - 1) // chunks[0]
    n_cj = (shape[1] + chunks[1] - 1) // chunks[1]
    for ci in range(n_ci):
        for cj in range(n_cj):
            if (ci, cj) in skip:
                continue
            raw = chunk_bytes(values, chunks, ci, cj, shape, fmt, order, fill_pad)
            if compressor and compressor["id"] == "zlib":
                raw = zlib.compress(raw, compressor["level"])
            with open(os.path.join(d, f"{ci}.{cj}"), "wb") as f:
                f.write(raw)
    return meta


def write_array_1d(root, name, values, dtype, fmt, compressor, fill_json,
                   fill_pad, n, chunk, sep=".", dims=None):
    d = os.path.join(root, name)
    os.makedirs(d)
    meta = {
        "zarr_format": 2,
        "shape": [n],
        "chunks": [chunk],
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": fill_json,
        "order": "C",
        "filters": None,
    }
    if sep != ".":
        meta["dimension_separator"] = sep
    with open(os.path.join(d, ".zarray"), "w") as f:
        json.dump(meta, f)
    if dims:
        with open(os.path.join(d, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": dims}, f)
    for ci in range((n + chunk - 1) // chunk):
        vals = [values[ci * chunk + i] if ci * chunk + i < n else fill_pad
                for i in range(chunk)]
        raw = struct.pack(fmt % len(vals), *vals)
        if compressor and compressor["id"] == "zlib":
            raw = zlib.compress(raw, compressor["level"])
        key = str(ci)  # 1-D: separator is irrelevant for the key itself
        with open(os.path.join(d, key), "wb") as f:
            f.write(raw)
    return meta


def main():
    zlib6 = {"id": "zlib", "level": 6}

    # ---- store 1: 2-D ----
    root = os.path.join(RES, "zarr_v2_2d")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    with open(os.path.join(root, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    shape, chunks = (5, 7), (3, 4)
    temp = [[10 * i + j + 0.5 for j in range(7)] for i in range(5)]
    counts = [[100 * i + j for j in range(7)] for i in range(5)]
    pressure = [[0.25 * (7 * i + j) for j in range(7)] for i in range(5)]
    write_array_2d(root, "temp", temp, "<f8", "<%dd", zlib6, "C",
                   99.5, 99.5, shape, chunks, skip={(1, 1)})
    write_array_2d(root, "counts", counts, "<i4", "<%di", zlib6, "F",
                   0, 0, shape, chunks)
    write_array_2d(root, "pressure", pressure, ">f4", ">%df", None, "C",
                   None, 0.0, shape, chunks)

    # ---- store 2: 1-D with consolidated metadata ----
    root1 = os.path.join(RES, "zarr_v2_1d")
    shutil.rmtree(root1, ignore_errors=True)
    os.makedirs(root1)
    with open(os.path.join(root1, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    n, chunk = 11, 4
    flag = [(i % 3 == 0) for i in range(n)]
    u8 = [245 + i % 11 for i in range(n)]
    id64 = [10 ** 12 + i for i in range(n)]
    m_flag = write_array_1d(root1, "flag", flag, "|b1", "<%d?", None,
                            False, False, n, chunk)
    m_u8 = write_array_1d(root1, "u8", u8, "|u1", "<%dB", None, 0, 0, n, chunk)
    m_id = write_array_1d(root1, "id64", id64, "<i8", "<%dq", zlib6,
                          0, 0, n, chunk, sep="/")
    consolidated = {
        "zarr_consolidated_format": 1,
        "metadata": {
            ".zgroup": {"zarr_format": 2},
            "flag/.zarray": m_flag,
            "u8/.zarray": m_u8,
            "id64/.zarray": m_id,
        },
    }
    with open(os.path.join(root1, ".zmetadata"), "w") as f:
        json.dump(consolidated, f)

    # ---- store 3: xarray-style lat/lon with _ARRAY_DIMENSIONS coords ----
    root2 = os.path.join(RES, "zarr_v2_latlon")
    shutil.rmtree(root2, ignore_errors=True)
    os.makedirs(root2)
    with open(os.path.join(root2, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    nlat, nlon = 4, 6
    data = [[10.0 * i + j for j in range(nlon)] for i in range(nlat)]
    lat = [38.0 + 0.5 * i for i in range(nlat)]
    lon = [-117.0 + 0.25 * j for j in range(nlon)]
    write_array_2d(root2, "data", data, "<f8", "<%dd", zlib6, "C",
                   0.0, 0.0, (nlat, nlon), (2, 3), dims=["lat", "lon"])
    write_array_1d(root2, "lat", lat, "<f8", "<%dd", None, 0.0, 0.0,
                   nlat, 2, dims=["lat"])
    write_array_1d(root2, "lon", lon, "<f8", "<%dd", None, 0.0, 0.0,
                   nlon, 3, dims=["lon"])

    # ---- store 3b: the CANONICAL xarray climate layout — a 3-D
    #      time x lat x lon cube whose time coordinate is <M8[ns]
    #      datetime64. temp[t][i][j] = 1000*t + 10*i + j (closed form),
    #      chunks (2,3,4) with edge chunks on every dim. ----
    rootc = os.path.join(RES, "zarr_v2_climate")
    shutil.rmtree(rootc, ignore_errors=True)
    os.makedirs(rootc)
    with open(os.path.join(rootc, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    nt, nlat2, nlon2 = 4, 5, 7
    ct, clat, clon = 2, 3, 4
    DAY = 86400 * 10 ** 9
    t0 = 1700000000000000000

    def write_cube(name, meta, chunks_bytes):
        d = os.path.join(rootc, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, ".zarray"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(d, ".zattrs"), "w") as f:
            json.dump({"_ARRAY_DIMENSIONS": meta.pop("_dims")}, f)
        for key, raw in chunks_bytes:
            with open(os.path.join(d, key), "wb") as f:
                f.write(raw)

    def cube_chunks():
        out = []
        for tc in range((nt + ct - 1) // ct):
            for ic in range((nlat2 + clat - 1) // clat):
                for jc in range((nlon2 + clon - 1) // clon):
                    vals = []
                    for dt in range(ct):
                        for di in range(clat):
                            for dj in range(clon):
                                t, i, j = tc * ct + dt, ic * clat + di, jc * clon + dj
                                if t < nt and i < nlat2 and j < nlon2:
                                    vals.append(1000.0 * t + 10.0 * i + j)
                                else:
                                    vals.append(0.0)  # full-chunk pad
                    raw = zlib.compress(struct.pack("<%dd" % len(vals), *vals), 6)
                    out.append((f"{tc}.{ic}.{jc}", raw))
        return out

    write_cube("temp",
               {"zarr_format": 2, "shape": [nt, nlat2, nlon2],
                "chunks": [ct, clat, clon], "dtype": "<f8",
                "compressor": zlib6, "fill_value": 0.0, "order": "C",
                "filters": None, "_dims": ["time", "lat", "lon"]},
               cube_chunks())
    for nm, nvals, cch, dtype, fmt, mk in [
        ("time", nt, ct, "<M8[ns]", "<%dq", lambda k: t0 + k * DAY),
        ("lat", nlat2, clat, "<f8", "<%dd", lambda k: 38.0 + 0.5 * k),
        ("lon", nlon2, clon, "<f8", "<%dd", lambda k: -117.0 + 0.25 * k)]:
        chunks_b = []
        for ci in range((nvals + cch - 1) // cch):
            vals = [mk(ci * cch + i) if ci * cch + i < nvals
                    else (0 if dtype.startswith("<M") else 0.0)
                    for i in range(cch)]
            chunks_b.append((str(ci), struct.pack(fmt % len(vals), *vals)))
        write_cube(nm,
                   {"zarr_format": 2, "shape": [nvals], "chunks": [cch],
                    "dtype": dtype, "compressor": None,
                    "fill_value": (0 if dtype.startswith("<M") else 0.0),
                    "order": "C", "filters": None, "_dims": [nm]},
                   chunks_b)
    print("wrote", rootc)

    # ---- store 4: string dtypes + numcodecs filter stacks ----
    # Everything here is encoded from the Zarr v2 / numcodecs format
    # docs with stdlib only (struct/zlib), independent of the repo's
    # decoders:
    #   vlen-utf8: u32-LE item count, then per item u32-LE byte length +
    #     UTF-8 bytes (numcodecs VLenUTF8).
    #   delta: element 0 verbatim, element i stores a[i]-a[i-1] in the
    #     same dtype (wrapping integer / IEEE float subtract).
    #   shuffle: all 0th element bytes, then all 1st bytes, …; tail
    #     shorter than one element carried verbatim.
    root3 = os.path.join(RES, "zarr_v2_typed")
    shutil.rmtree(root3, ignore_errors=True)
    os.makedirs(root3)
    with open(os.path.join(root3, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    n, chunk = 11, 4

    def delta_ints(vals, bits):
        # diffs here stay well inside the dtype range, so no wrapping is
        # needed for struct.pack
        return [vals[0]] + [vals[i] - vals[i - 1]
                            for i in range(1, len(vals))]

    def shuffle_bytes(raw, es):
        count = len(raw) // es
        out = bytearray(len(raw))
        for i in range(count):
            for j in range(es):
                out[j * count + i] = raw[i * es + j]
        off = count * es
        out[off:] = raw[off:]
        return bytes(out)

    def vlen_utf8(vals):
        out = struct.pack("<I", len(vals))
        for s in vals:
            b = s.encode("utf-8")
            out += struct.pack("<I", len(b)) + b
        return out

    def write_raw_array(name, meta, chunks_bytes, skip=()):
        d = os.path.join(root3, name)
        os.makedirs(d)
        with open(os.path.join(d, ".zarray"), "w") as f:
            json.dump(meta, f)
        for ci, raw in enumerate(chunks_bytes):
            if ci in skip:
                continue
            with open(os.path.join(d, str(ci)), "wb") as f:
                f.write(raw)

    def v2meta(dtype, compressor, filters, fill):
        return {"zarr_format": 2, "shape": [n], "chunks": [chunk],
                "dtype": dtype, "compressor": compressor,
                "fill_value": fill, "order": "C", "filters": filters}

    zl = zlib6

    # |O + vlen-utf8 (+ zlib), with one ABSENT chunk (fill null → "")
    labels = ["", "néé", "doc-2", "αβγ", "doc-4", "x" * 7, "doc-6",
              "doc-7", "doc-8", "doc-9", "doc-10"]
    lab_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [labels[ci * chunk + i] if ci * chunk + i < n else ""
                for i in range(chunk)]
        lab_chunks.append(zlib.compress(vlen_utf8(vals), 6))
    write_raw_array("label", v2meta("|O", zl, [{"id": "vlen-utf8"}], None),
                    lab_chunks, skip={2})

    # |S4 raw fixed bytes, NUL-padded, ASCII
    codes = ["AA", "BBB", "C", "DDDD", "E", "FF", "GGG", "H", "II",
             "JJJ", "K"]
    code_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        raw = b""
        for i in range(chunk):
            g = ci * chunk + i
            s = codes[g] if g < n else ""
            raw += s.encode("ascii").ljust(4, b"\x00")
        code_chunks.append(raw)
    write_raw_array("code", v2meta("|S4", None, None, ""), code_chunks)

    # <U5 + zlib, non-ASCII content (UCS-4 little endian)
    unames = ["αβ", "übèr", "ζ", "north", "süd", "ωμέγα"[:5], "east",
              "wést", "ñ", "δέλτα"[:5], "x"]
    un_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        raw = b""
        for i in range(chunk):
            g = ci * chunk + i
            s = unames[g] if g < n else ""
            cps = [ord(c) for c in s] + [0] * (5 - len(s))
            raw += struct.pack("<5I", *cps)
        un_chunks.append(zlib.compress(raw, 6))
    write_raw_array("uname", v2meta("<U5", zl, None, ""), un_chunks)

    # >U3 raw big-endian UCS-4
    tags = ["ab", "ω", "xyz", "t", "ββ", "qq", "r", "sss", "tt", "u",
            "vvv"]
    tag_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        raw = b""
        for i in range(chunk):
            g = ci * chunk + i
            s = tags[g] if g < n else ""
            cps = [ord(c) for c in s] + [0] * (3 - len(s))
            raw += struct.pack(">3I", *cps)
        tag_chunks.append(raw)
    write_raw_array("tag", v2meta(">U3", None, None, ""), tag_chunks)

    # |S3 raw with a BASE64 fill_value ("NA") and chunk 1 ABSENT — the
    # v2 spec Base64-encodes fill_value for S dtypes
    import base64
    pads = ["p0", "p1", "p2", "p3", "", "", "", "", "p8", "p9", "p10"]
    pad_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        raw = b""
        for i in range(chunk):
            g = ci * chunk + i
            s = pads[g] if g < n else ""
            raw += s.encode("ascii").ljust(3, b"\x00")
        pad_chunks.append(raw)
    write_raw_array(
        "pad",
        v2meta("|S3", None, None, base64.b64encode(b"NA").decode("ascii")),
        pad_chunks, skip={1})

    # <i4 + delta filter + zlib (values non-monotonic to get negative
    # diffs) — the canonical climate-store stack
    dv = [1000, 1007, 995, 1020, 1020, 980, 1001, 1002, 999, 1050, 1049]
    dv_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [dv[ci * chunk + i] if ci * chunk + i < n else 0
                for i in range(chunk)]
        enc = delta_ints(vals, 32)
        dv_chunks.append(zlib.compress(struct.pack("<%di" % len(enc), *enc), 6))
    write_raw_array(
        "dv", v2meta("<i4", zl, [{"id": "delta", "dtype": "<i4"}], 0),
        dv_chunks)

    # <f8 + delta, uncompressed (IEEE float diffs)
    dd = [0.5 * i * i - 3.0 * i for i in range(n)]
    dd_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [dd[ci * chunk + i] if ci * chunk + i < n else 0.0
                for i in range(chunk)]
        enc = [vals[0]] + [vals[i] - vals[i - 1] for i in range(1, len(vals))]
        dd_chunks.append(struct.pack("<%dd" % len(enc), *enc))
    write_raw_array(
        "dd", v2meta("<f8", None, [{"id": "delta", "dtype": "<f8"}], 0.0),
        dd_chunks)

    # <i8 + [delta, shuffle] + zlib — a two-filter stack; decode must
    # unshuffle BEFORE undelta (reverse of encode order)
    ds = [10 ** 9 + 17 * i * i for i in range(n)]
    ds_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [ds[ci * chunk + i] if ci * chunk + i < n else 0
                for i in range(chunk)]
        enc = [vals[0]] + [vals[i] - vals[i - 1] for i in range(1, len(vals))]
        raw = struct.pack("<%dq" % len(enc), *enc)
        ds_chunks.append(zlib.compress(shuffle_bytes(raw, 8), 6))
    write_raw_array(
        "ds", v2meta("<i8", zl,
                     [{"id": "delta", "dtype": "<i8"},
                      {"id": "shuffle", "elementsize": 8}], 0),
        ds_chunks)

    # <f8 + fixedscaleoffset(offset=1000, scale=10, astype |u1) + zlib:
    # x_i = 1000 + 0.3*i quantizes to exact small ints 3*i
    fso_meta = v2meta("<f8", zl, [{"id": "fixedscaleoffset", "offset": 1000,
                                   "scale": 10, "dtype": "<f8",
                                   "astype": "|u1"}], 0.0)
    fso_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        q = []
        for i in range(chunk):
            g = ci * chunk + i
            x = 1000 + 0.3 * g if g < n else 0.0
            # round-half-to-even, exactly numpy.around
            q.append(int(round((x - 1000) * 10)) & 0xFF)
        fso_chunks.append(zlib.compress(struct.pack("<%dB" % len(q), *q), 6))
    write_raw_array("fso", fso_meta, fso_chunks)

    # <f8 + [fixedscaleoffset(astype <i2), delta(<i2)] — a RE-TYPING
    # two-filter stack: the delta operates on the i2 quantized repr, not
    # the f8 array dtype (pins the translator's stored-repr tracking)
    fsod_meta = v2meta("<f8", zl,
                       [{"id": "fixedscaleoffset", "offset": 0, "scale": 100,
                         "dtype": "<f8", "astype": "<i2"},
                        {"id": "delta", "dtype": "<i2"}], 0.0)
    fsod_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        q = []
        for i in range(chunk):
            g = ci * chunk + i
            x = 0.07 * g * g if g < n else 0.0
            q.append(int(round(x * 100)))
        enc = [q[0]] + [q[i] - q[i - 1] for i in range(1, len(q))]
        fsod_chunks.append(zlib.compress(struct.pack("<%dh" % len(enc), *enc), 6))
    write_raw_array("fsod", fsod_meta, fsod_chunks)

    # |b1 + packbits (leading byte = count of padding bits, MSB-first)
    pb_meta = v2meta("|b1", None, [{"id": "packbits"}], False)
    pb_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        bits = []
        for i in range(chunk):
            g = ci * chunk + i
            bits.append(1 if (g < n and g % 3 == 1) else 0)
        nbits = len(bits)
        pad = (8 - nbits % 8) % 8
        packed = bytearray([pad])
        for byte_i in range((nbits + 7) // 8):
            b = 0
            for k in range(8):
                idx = byte_i * 8 + k
                if idx < nbits and bits[idx]:
                    b |= 0x80 >> k
            packed.append(b)
        pb_chunks.append(bytes(packed))
    write_raw_array("pb", pb_meta, pb_chunks)

    # |O + vlen-bytes object codec (+ zlib): variable-length BINARY
    # payloads — the multimodal-blob column shape — with chunk 1 ABSENT
    # (fill → empty payload). Same framing as vlen-utf8: u32-LE count,
    # then u32-LE length + raw bytes per element.
    def payload(i):
        return bytes((i * 7 + j) % 256 for j in range(i % 5 + 1))

    def vlen_bytes(vals):
        out = struct.pack("<I", len(vals))
        for b in vals:
            out += struct.pack("<I", len(b)) + b
        return out

    blob_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [payload(ci * chunk + i) if ci * chunk + i < n else b""
                for i in range(chunk)]
        blob_chunks.append(zlib.compress(vlen_bytes(vals), 6))
    write_raw_array("blob", v2meta("|O", zl, [{"id": "vlen-bytes"}], None),
                    blob_chunks, skip={1})

    # |O + vlen-bytes holding REAL PNGs (spec-from-scratch encoder:
    # signature + IHDR + IDAT(zlib, filter-0 scanlines) + IEND with
    # CRC32s) — solid-color truecolor images with closed-form dims and
    # luma, so the JDK decode path can be oracle-certified end to end.
    def png(w, h, r, g, b):
        def chunk_png(tag, data):
            return (struct.pack(">I", len(data)) + tag + data +
                    struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + bytes([r, g, b]) * w for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n" + chunk_png(b"IHDR", ihdr) +
                chunk_png(b"IDAT", zlib.compress(raw, 6)) + chunk_png(b"IEND", b""))

    png_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = []
        for i in range(chunk):
            g = ci * chunk + i
            if g < n:
                vals.append(png((g % 3) + 2, (g % 2) + 2,
                                (g * 31) % 256, (g * 57) % 256, 42))
            else:
                vals.append(b"")
        png_chunks.append(vlen_bytes(vals))
    write_raw_array("png", v2meta("|O", None, [{"id": "vlen-bytes"}], None),
                    png_chunks)

    # <i4 + bz2 compressor and <f8 + lzma (XZ container) compressor —
    # the remaining numcodecs compressors the JVM classpath can decode
    import bz2 as _bz2
    import lzma as _lzma
    bzv = [13 * i - 40 for i in range(n)]
    bzv_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [bzv[ci * chunk + i] if ci * chunk + i < n else 0
                for i in range(chunk)]
        bzv_chunks.append(_bz2.compress(struct.pack("<%di" % len(vals), *vals), 5))
    write_raw_array("bzv", v2meta("<i4", {"id": "bz2", "level": 5}, None, 0),
                    bzv_chunks)

    xzv = [2.5 * i - 7.0 for i in range(n)]
    xzv_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [xzv[ci * chunk + i] if ci * chunk + i < n else 0.0
                for i in range(chunk)]
        xzv_chunks.append(_lzma.compress(struct.pack("<%dd" % len(vals), *vals),
                                         format=_lzma.FORMAT_XZ))
    write_raw_array(
        "xzv",
        v2meta("<f8", {"id": "lzma", "format": 1, "check": -1,
                       "preset": None, "filters": None}, None, 0.0),
        xzv_chunks)

    # <i8 + lz4 compressor — the numcodecs LZ4 block container: u32-LE
    # uncompressed-size prefix + ONE raw LZ4 block (not the frame
    # format). Emitted WITHOUT any lz4 library so this stays an
    # independent check: a literal-only sequence is always a valid LZ4
    # block, and chunks whose 32 bytes are one 8-byte pattern repeated
    # get a HANDCRAFTED match-bearing block (8 literals + overlapping
    # match of length 12 at offset 8 + 12-literal tail, satisfying the
    # spec's end-of-block rules) so the reader's match/copy path is
    # exercised too, not just literal runs.
    def lz4_literal_block(raw):
        out = bytearray()
        nb = len(raw)
        tok = min(nb, 15)
        out.append(tok << 4)
        if tok == 15:
            rem = nb - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += raw
        return bytes(out)

    def lz4_pattern_block(raw):
        assert len(raw) == 32 and raw[:8] * 4 == raw
        out = bytearray()
        out.append((8 << 4) | (12 - 4))   # 8 literals, matchlen 12
        out += raw[:8]
        out += struct.pack("<H", 8)       # match offset (overlapping copy)
        out.append(12 << 4)               # final sequence: literals only
        out += raw[20:32]
        return bytes(out)

    def numcodecs_lz4(raw):
        if len(raw) == 32 and raw[:8] * 4 == raw:
            blk = lz4_pattern_block(raw)
        else:
            blk = lz4_literal_block(raw)
        return struct.pack("<i", len(raw)) + blk

    # constant within each full chunk -> those chunks take the
    # match-bearing path; the padded tail chunk is literal-only
    lzv = [500 + 11 * (i // chunk) for i in range(n)]
    lzv_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [lzv[ci * chunk + i] if ci * chunk + i < n else 0
                for i in range(chunk)]
        lzv_chunks.append(numcodecs_lz4(struct.pack("<%dq" % len(vals), *vals)))
    write_raw_array("lzv", v2meta("<i8", {"id": "lz4", "acceleration": 1},
                                  None, 0),
                    lzv_chunks)

    # <M8[ns] datetime64 + zlib: the xarray time-coordinate dtype.
    # Stored as int64 epoch-ns counts; the reader surfaces the RAW
    # counts as BIGINT (lossless incl. the NaT sentinel = int64 min,
    # which a timestamp mapping would corrupt into a "valid" instant).
    NAT = -(2 ** 63)
    DAY_NS = 86400 * 10 ** 9
    tsv = [1700000000000000000 + i * DAY_NS for i in range(n)]
    tsv[3] = NAT  # one missing timestamp
    ts_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [tsv[ci * chunk + i] if ci * chunk + i < n else 0
                for i in range(chunk)]
        ts_chunks.append(zlib.compress(struct.pack("<%dq" % len(vals), *vals), 6))
    write_raw_array("ts", v2meta("<M8[ns]", zl, None, 0), ts_chunks)

    # <f4 + quantize (lossy at write time; decode is the identity)
    qz_meta = v2meta("<f4", None,
                     [{"id": "quantize", "digits": 3, "dtype": "<f4"}], 0.0)
    qz_chunks = []
    for ci in range((n + chunk - 1) // chunk):
        vals = [0.5 * (ci * chunk + i) if ci * chunk + i < n else 0.0
                for i in range(chunk)]
        qz_chunks.append(struct.pack("<%df" % len(vals), *vals))
    write_raw_array("qz", qz_meta, qz_chunks)

    # consolidated metadata over every typed array: one-GET inference on
    # the richest store (16 arrays x string/filter/compressor variety)
    meta_entries = {".zgroup": {"zarr_format": 2}}
    for name in sorted(os.listdir(root3)):
        zp = os.path.join(root3, name, ".zarray")
        if os.path.isfile(zp):
            with open(zp) as f:
                meta_entries[f"{name}/.zarray"] = json.load(f)
    with open(os.path.join(root3, ".zmetadata"), "w") as f:
        json.dump({"zarr_consolidated_format": 1, "metadata": meta_entries}, f)

    print("wrote", root)
    print("wrote", root1)
    print("wrote", root2)
    print("wrote", root3)


if __name__ == "__main__":
    main()
