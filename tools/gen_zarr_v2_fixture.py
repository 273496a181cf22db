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

    print("wrote", root)
    print("wrote", root1)
    print("wrote", root2)


if __name__ == "__main__":
    main()
