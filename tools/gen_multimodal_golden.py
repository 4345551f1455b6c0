#!/usr/bin/env python3
"""Golden features for the multimodal_features query.

Independent Python reimplementation of Multimodal.synthetic(99) +
featurize (MediaCodec stats), bit-exact with the Scala engine:
- double accumulation in the SAME order as the Scala decoders
  (BMP iterates storage rows bottom-up; PPM row-major; WAV in sample
  order),
- float32 narrowing emulated with struct round-trips (the f64->f32
  double-rounding hazard is asserted away for the stub's b/255 terms).

Output: src/test/resources/golden/multimodal_features.parquet with
(id BIGINT, kind VARCHAR, f0..f7 DOUBLE) — the DuckDB oracle SELECTs
it directly.
"""
import math
import pathlib
import struct

import duckdb
import pandas as pd

OUT = pathlib.Path(__file__).resolve().parent.parent / \
    'src/test/resources/golden/multimodal_features.parquet'
FEAT_DIM = 8


def f32(x: float) -> float:
    return struct.unpack('<f', struct.pack('<f', x))[0]


def image_features(i: int):
    w = 2 + i % 6
    h = 2 + (i * 7) % 5
    def px(y, x):
        return ((i * 31 + y * w + x) % 256, (i * 17 + x) % 256,
                (i * 7 + y) % 256)
    sr = sg = sb = 0.0
    if i % 6 == 0:  # BMP: decoder iterates storage rows = bottom-up
        rows = [h - 1 - ys for ys in range(h)]
    else:  # PPM, and PNG (i%12==3; lossless ⇒ same pixels): row-major
        rows = list(range(h))
    for y in rows:
        for x in range(w):
            r, g, b = px(y, x)
            sr += r
            sg += g
            sb += b
    n = float(w) * h
    mean_r, mean_g, mean_b = sr / n / 255.0, sg / n / 255.0, sb / n / 255.0
    bright = (mean_r + mean_g + mean_b) / 3.0
    return [1.0, float(w), float(h), 3.0, mean_r, mean_g, mean_b, bright]


def audio_features(i: int):
    sr_hz = 8000
    nsamp = 160 + (i % 5) * 80
    sum_sq = 0.0
    peak = 0.0
    crossings = 0
    prev_neg = False
    for j in range(nsamp):
        sample = ((i * 31 + j * 997) % 2048 - 1024) * 16
        s = sample / 32768.0
        sum_sq += s * s
        a = abs(s)
        if a > peak:
            peak = a
        neg = s < 0
        if j > 0 and neg != prev_neg:
            crossings += 1
        prev_neg = neg
    n_frames = nsamp  # mono
    rms = math.sqrt(sum_sq / nsamp) if nsamp else 0.0
    zcr = crossings / (nsamp - 1) if nsamp > 1 else 0.0
    dur = n_frames / sr_hz
    return [2.0, float(sr_hz), 1.0, dur, rms, peak, zcr, float(n_frames)]


def y4m_rows(i: int):
    """Geometry + Y-plane generator mirroring Multimodal.synthetic's
    real-Y4M branch (video rows with (i//3) % 2 == 0)."""
    v = i // 3
    w = 4 + 2 * (v % 3)
    h = 4 + 2 * ((v * 5) % 3)
    nf = 2 + v % 3
    fps = [25, 30, 24][v % 3]
    return v, w, h, nf, fps


def y4m_features(i: int):
    # MediaCodec.decodeY4m: sequential double fold over Y planes only,
    # frame-then-row-major order; chroma skipped.
    _, w, h, nf, fps = y4m_rows(i)
    ysize = w * h
    total = 0.0
    total_sq = 0.0
    for f in range(nf):
        for p in range(ysize):
            y = float((i * 31 + f * 97 + p * 13) % 256)
            total += y
            total_sq += y * y
    n = float(nf) * ysize
    mean = total / n
    variance = max(0.0, total_sq / n - mean * mean)
    std = math.sqrt(variance)
    return [3.0, float(w), float(h), float(fps), mean / 255.0, std / 255.0,
            float(nf), float(nf)]


def video_features(i: int):
    if (i // 3) % 2 == 0:
        return y4m_features(i)
    return stub_features(i)


def frame_rows(i: int):
    """MediaCodec.y4mFrameLuma(frameStep=1): per-frame Y-plane mean,
    sequential double sum, NO float narrowing (emitted as double)."""
    if (i // 3) % 2 != 0:
        return []
    _, w, h, nf, _ = y4m_rows(i)
    ysize = w * h
    out = []
    for f in range(nf):
        s = 0.0
        for p in range(ysize):
            s += float((i * 31 + f * 97 + p * 13) % 256)
        out.append({'id': i, 'frameIdx': f, 'lumaMean': s / ysize})
    return out


def stub_features(i: int):
    # decodeStub: float32 fold of the opaque blob. f32 addition of two
    # f32 values is exact in f64, so f32(acc + term) is the correctly
    # rounded f32 sum; the b/255.0f term is checked below.
    nbytes = 64 + i % 64
    out = [0.0] * FEAT_DIM
    for j in range(nbytes):
        b = (i * 31 + j) % 251
        out[j % FEAT_DIM] = f32(out[j % FEAT_DIM] + f32(b / 255.0))
    return out


def resized_features(i: int, dw: int = 4, dh: int = 3):
    """NN-resize of the synthetic image rows to (dw x dh) then the
    PPM-path featurize: dest pixel (y, x) = src(floor(y*sh/dh),
    floor(x*sw/dw)); output is lossless PPM so the decode is exact,
    row-major."""
    sw = 2 + i % 6
    sh = 2 + (i * 7) % 5
    def px(y, x):
        return ((i * 31 + y * sw + x) % 256, (i * 17 + x) % 256,
                (i * 7 + y) % 256)
    sr = sg = sb = 0.0
    for y in range(dh):
        for x in range(dw):
            r, g, b = px(y * sh // dh, x * sw // dw)
            sr += r
            sg += g
            sb += b
    n = float(dw) * dh
    mean_r, mean_g, mean_b = sr / n / 255.0, sg / n / 255.0, sb / n / 255.0
    bright = (mean_r + mean_g + mean_b) / 3.0
    return [1.0, float(dw), float(dh), 3.0, mean_r, mean_g, mean_b, bright]


def phash_rows():
    """Mirror of Multimodal.imageNearDupPairs over the synthetic image
    rows plus their 8x6 NN-resized copies (id + 1000): aHash = 8x8
    integer-NN luma grid (BT.601 integer luma, bit set iff
    luma*64 >= sum), brute-force Hamming pairs with dist <= 6 — equal
    to the banded pass by pigeonhole (bands=8 > maxDist=6)."""
    def ahash(w, h, P):
        lum = []
        for y in range(8):
            for x in range(8):
                r, g, b = P(y * h // 8, x * w // 8)
                lum.append((299 * r + 587 * g + 114 * b) // 1000)
        s = sum(lum)
        hsh = 0
        for j, l in enumerate(lum):
            if l * 64 >= s:
                hsh |= 1 << j
        return hsh
    hashes = {}
    for i in range(99):
        if i % 3 != 0:
            continue
        w = 2 + i % 6
        h = 2 + (i * 7) % 5
        def P(y, x, i=i, w=w):
            return ((i * 31 + y * w + x) % 256, (i * 17 + x) % 256,
                    (i * 7 + y) % 256)
        hashes[i] = ahash(w, h, P)
        # resized copy (dw=8, dh=6): dest (ry, rx) <- src(ry*h//6, rx*w//8)
        def P2(ry, rx, P=P, w=w, h=h):
            return P(ry * h // 6, rx * w // 8)
        hashes[i + 1000] = ahash(8, 6, P2)
    ids = sorted(hashes)
    out = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin(hashes[ids[a]] ^ hashes[ids[b]]).count('1')
            if d <= 6:
                out.append({'d1': ids[a], 'd2': ids[b], 'dist': d})
    return out


def audio_phash_rows():
    """Mirror of Multimodal.audioNearDupPairs over the synthetic audio
    rows plus their volume-halved copies (id + 1000): energy-delta
    fingerprint (65 integer-bound windows, energy = sum |sample|, bit
    set iff e(w+1)*len(w) > e(w)*len(w+1)), brute-force Hamming pairs
    with dist <= 6 — equal to the banded pass by pigeonhole."""
    def samples(i):
        nsamp = 160 + (i % 5) * 80
        return [((i * 31 + j * 997) % 2048 - 1024) * 16
                for j in range(nsamp)]

    def ahash(ss):
        n = len(ss)
        if n < 65:
            return None
        bounds = [w * n // 65 for w in range(66)]
        e = [sum(abs(s) for s in ss[bounds[w]:bounds[w + 1]])
             for w in range(65)]
        ln = [bounds[w + 1] - bounds[w] for w in range(65)]
        h = 0
        for w in range(64):
            if e[w + 1] * ln[w] > e[w] * ln[w + 1]:
                h |= 1 << w
        return h

    hashes = {}
    for i in range(99):
        if i % 3 != 1:
            continue
        ss = samples(i)
        hashes[i] = ahash(ss)
        # int(s/2): truncation toward zero, the Scala (s / div).toShort
        hashes[i + 1000] = ahash([int(s / 2) for s in ss])
    ids = sorted(k for k, v in hashes.items() if v is not None)
    out = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin(hashes[ids[a]] ^ hashes[ids[b]]).count('1')
            if d <= 6:
                out.append({'d1': ids[a], 'd2': ids[b], 'dist': d})
    return out


def video_phash_rows():
    """Mirror of Multimodal.videoNearDupPairs over the synthetic Y4M
    video rows plus their fps-retagged copies (id + 1000): first-frame
    Y-plane aHash (8x8 integer-NN grid, bit set iff luma*64 >= sum),
    brute-force Hamming pairs with dist <= 6. Opaque-blob video rows
    hash to None and drop out; retagging changes no frame bytes, so
    every copy is a distance-0 pair."""
    def vhash(i):
        if (i // 3) % 2 != 0:
            return None  # opaque blob row: not Y4M
        v = i // 3
        w = 4 + 2 * (v % 3)
        h = 4 + 2 * ((v * 5) % 3)
        lum = [((i * 31 + ((y * h // 8) * w + (x * w // 8)) * 13) % 256)
               for y in range(8) for x in range(8)]
        sm = sum(lum)
        hsh = 0
        for j, l in enumerate(lum):
            if l * 64 >= sm:
                hsh |= 1 << j
        return hsh

    hashes = {}
    for i in range(99):
        if i % 3 != 2:
            continue
        hv = vhash(i)
        if hv is not None:
            hashes[i] = hv
            hashes[i + 1000] = hv  # fps retag: frame bytes untouched
    ids = sorted(hashes)
    out = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin(hashes[ids[a]] ^ hashes[ids[b]]).count('1')
            if d <= 6:
                out.append({'d1': ids[a], 'd2': ids[b], 'dist': d})
    return out


def assert_no_double_rounding():
    from fractions import Fraction
    for b in range(256):
        via_double = f32(b / 255.0)
        # correctly-rounded f32 of the exact rational, via extended scan
        exact = Fraction(b, 255)
        lo, hi = struct.unpack('<f', struct.pack('<f', float(exact)))[0], None
        # float(exact) rounds to nearest double; f32 of that must equal
        # f32 of the exact value — check by comparing against both f32
        # neighbors of the double approximation
        cands = set()
        d = float(exact)
        for bits_off in (-1, 0, 1):
            fb = struct.unpack('<I', struct.pack('<f', f32(d)))[0] + bits_off
            if 0 <= fb < 2**32:
                cands.add(struct.unpack('<f', struct.pack('<I', fb))[0])
        best = min(cands, key=lambda c: abs(Fraction(c) - exact))
        assert via_double == best, f'double rounding at b={b}'


def main() -> None:
    assert_no_double_rounding()
    rows = []
    for i in range(99):
        kind = ['image', 'audio', 'video'][i % 3]
        feats = {'image': image_features, 'audio': audio_features,
                 'video': video_features}[kind](i)
        # Scala narrows every feature slot to Float, then the query
        # widens back to double — exact, so narrow here too.
        feats = [f32(x) for x in feats]
        rows.append({'id': i, 'kind': kind,
                     **{f'f{k}': feats[k] for k in range(FEAT_DIM)}})
    df = pd.DataFrame(rows)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.register('t', df)
    con.execute(f"""
        COPY (SELECT CAST(id AS BIGINT) AS id, kind,
                     {', '.join(f'CAST(f{k} AS DOUBLE) AS f{k}'
                                for k in range(FEAT_DIM))}
              FROM t ORDER BY id)
        TO '{OUT}' (FORMAT PARQUET)""")
    print(f'wrote {OUT} ({len(rows)} rows)')

    rrows = []
    for i in range(99):
        if i % 3 != 0:
            continue
        feats = [f32(x) for x in resized_features(i)]
        rrows.append({'id': i, **{f'f{k}': feats[k] for k in range(FEAT_DIM)}})
    rdf = pd.DataFrame(rrows)
    con.register('rz', rdf)
    rout = OUT.parent / 'multimodal_resize.parquet'
    con.execute(f"""
        COPY (SELECT CAST(id AS BIGINT) AS id,
                     {', '.join(f'CAST(f{k} AS DOUBLE) AS f{k}'
                                for k in range(FEAT_DIM))}
              FROM rz ORDER BY id)
        TO '{rout}' (FORMAT PARQUET)""")
    print(f'wrote {rout} ({len(rrows)} rows)')

    frames = [fr for i in range(99) if i % 3 == 2 for fr in frame_rows(i)]
    fdf = pd.DataFrame(frames)
    con.register('fr', fdf)
    fout = OUT.parent / 'multimodal_frames.parquet'
    con.execute(f"""
        COPY (SELECT CAST(id AS BIGINT) AS id,
                     CAST(frameIdx AS BIGINT) AS "frameIdx",
                     CAST(lumaMean AS DOUBLE) AS "lumaMean"
              FROM fr ORDER BY id, "frameIdx")
        TO '{fout}' (FORMAT PARQUET)""")
    print(f'wrote {fout} ({len(frames)} rows)')

    nd = pd.DataFrame(phash_rows())
    con.register('nd', nd)
    nout = OUT.parent / 'multimodal_neardup.parquet'
    con.execute(f'''
        COPY (SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
                     CAST(dist AS INTEGER) AS dist
              FROM nd ORDER BY d1, d2)
        TO '{nout}' (FORMAT PARQUET)''')
    print(f'wrote {nout} ({len(nd)} rows)')

    an = pd.DataFrame(audio_phash_rows())
    con.register('an', an)
    aout = OUT.parent / 'multimodal_audio_neardup.parquet'
    con.execute(f'''
        COPY (SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
                     CAST(dist AS INTEGER) AS dist
              FROM an ORDER BY d1, d2)
        TO '{aout}' (FORMAT PARQUET)''')
    print(f'wrote {aout} ({len(an)} rows)')

    vn = pd.DataFrame(video_phash_rows())
    con.register('vn', vn)
    vout = OUT.parent / 'multimodal_video_neardup.parquet'
    con.execute(f'''
        COPY (SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
                     CAST(dist AS INTEGER) AS dist
              FROM vn ORDER BY d1, d2)
        TO '{vout}' (FORMAT PARQUET)''')
    print(f'wrote {vout} ({len(vn)} rows)')


if __name__ == '__main__':
    main()
