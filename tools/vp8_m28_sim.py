#!/usr/bin/env python3
"""m28 fixture + oracle simulation: encode the four regimes exactly as
ops/Vp8.scala encodeFixture does, decode with libwebp (referee), and
recompute the expected stats via the ANALYTIC formulas the DuckDB oracle
will use. All three must agree for every seed."""
import sys
sys.path.insert(0, '/root/repo/tools')
from vp8_proto import *

def fixture(ki):
    """Mirror of Vp8.encodeFixture."""
    v = ki % 4
    if v == 0:
        qi = ki % 48
        d0 = (ki % 5) - 2
        w1 = (ki % 3) - 1
        co = {'y2': {0: d0, 1: w1}}
        for i in range(16):
            co[('y', i)] = {1: ((ki + i) % 7) - 3, 2: ((2 * ki + i) % 5) - 2}
        for i in range(4):
            co[('u', i)] = {0: ((ki + i) % 5) - 2, 1: ((ki + 2 * i) % 3) - 1}
            co[('v', i)] = {0: ((2 * ki + i) % 5) - 2, 1: ((ki + i) % 3) - 1}
        w = 16 - (ki % 5); h = 16 - (ki % 7)
        return encode_frame(w, h, [[MBPlan(0, None, 0, False, co)]], qi=qi), (w, h)
    if v == 1:
        ym = (ki // 4) % 4; uvm = (ki // 16) % 4
        return encode_frame(16, 16, [[MBPlan(ym, None, uvm, True)]], qi=ki % 64), (16, 16)
    if v == 2:
        bm = [(ki // 4) % 10] * 16
        co = {('y', 0): {0: (ki % 5) - 2, 1: (ki % 3) - 1}}
        return encode_frame(4, 4, [[MBPlan(4, bm, 0, False, co)]], qi=ki % 32), (4, 4)
    plans = [[MBPlan((ki + 2 * r + c) % 4, None, (ki + r + 2 * c) % 4, True)
              for c in range(2)] for r in range(2)]
    return encode_frame(32, 32, plans, qi=ki % 64), (32, 32)

# ---------------- analytic oracle formulas (independent arithmetic) ----
def fdiv(a, b):  # python // is floor like arithmetic >> — keep explicit
    return a // b

def oracle_stats(ki):
    v = ki % 4
    if v == 0:
        qi = ki % 48
        d0 = (ki % 5) - 2
        w1 = (ki % 3) - 1
        ydc, yac, y2dc, y2ac, uvdc, uvac = quantizers(qi)
        w = 16 - (ki % 5); h = 16 - (ki % 7)
        d0q = d0 * y2dc; w1q = w1 * y2ac
        # WHT closed form: DC for block col c in {0,1}: (d0q+w1q+3)>>3; {2,3}: (d0q-w1q+3)>>3
        def whtdc(bc):
            return (d0q + w1q + 3) >> 3 if bc < 2 else (d0q - w1q + 3) >> 3
        def idct3(dc, c1r, c4r):
            # coefficients at raster 0 (dc), 1 (c1r), 4 (c4r)
            out = [0] * 16
            cc = (c4r * 35468) >> 16
            dd = c4r + ((c4r * 20091) >> 16)
            t0 = [dc + dd, dc + cc, dc - cc, dc - dd]
            c1 = (c1r * 35468) >> 16
            d1 = c1r + ((c1r * 20091) >> 16)
            for r in range(4):
                out[4 * r + 0] = (t0[r] + d1 + 4) >> 3
                out[4 * r + 1] = (t0[r] + c1 + 4) >> 3
                out[4 * r + 2] = (t0[r] - c1 + 4) >> 3
                out[4 * r + 3] = (t0[r] - d1 + 4) >> 3
            return out
        sy = 0; es = 0
        for b in range(16):
            br, bc = b // 4, b % 4
            a = (((ki + b) % 7) - 3) * yac     # zigzag1 -> raster 1
            c = (((2 * ki + b) % 5) - 2) * yac # zigzag2 -> raster 4
            r = idct3(whtdc(bc), a, c)
            for yy in range(4):
                for xx in range(4):
                    X = bc * 4 + xx; Yc = br * 4 + yy
                    if X < w and Yc < h:
                        p = clamp(128 + r[yy * 4 + xx])
                        sy += p
                        if X % 2 == 0 and Yc % 2 == 0:
                            es += p
        cw = (w + 1) // 2; ch = (h + 1) // 2
        su = 0; sv = 0
        for b in range(4):
            br, bc = b // 2, b % 2
            du = (((ki + b) % 5) - 2) * uvdc
            au = (((ki + 2 * b) % 3) - 1) * uvac
            dv = (((2 * ki + b) % 5) - 2) * uvdc
            av = (((ki + b) % 3) - 1) * uvac
            ru = idct3(0, au, 0); rv = idct3(0, av, 0)
            # chroma has no WHT: dc is raster0 directly -> idct of {0:du,1:au}
            ru = idct3_dc(du, au); rv = idct3_dc(dv, av)
            for yy in range(4):
                for xx in range(4):
                    X = bc * 4 + xx; Yc = br * 4 + yy
                    if X < cw and Yc < ch:
                        su += clamp(128 + ru[yy * 4 + xx])
                        sv += clamp(128 + rv[yy * 4 + xx])
        return (w, h, sy, su, sv, es)
    if v == 1:
        ym = (ki // 4) % 4; uvm = (ki // 16) % 4
        ypix = {0: 128, 1: 127, 2: 129, 3: 129}[ym]  # TM: clamp(129+127-127)
        uvpix = {0: 128, 1: 127, 2: 129, 3: 129}[uvm]
        return (16, 16, 256 * ypix, 64 * uvpix, 64 * uvpix, 64 * ypix)
    if v == 2:
        m = (ki // 4) % 10
        qi = ki % 32
        ydc, yac, _, _, _, _ = quantizers(qi)
        dc = ((ki % 5) - 2) * ydc
        a1 = ((ki % 3) - 1) * yac
        r = idct3_dc(dc, a1)
        S = [129, 129, 129, 129, 127, 127, 127, 127, 127]
        E = [127] * 8
        L = [129] * 4; A = [127] * 4; P = 127
        def avg3(a, b, c): return (a + 2 * b + c + 2) >> 2
        def avg2(a, b): return (a + b + 1) >> 1
        pred = [[0] * 4 for _ in range(4)]
        if m == 0:
            vv = (sum(A) + sum(L) + 4) >> 3
            pred = [[vv] * 4 for _ in range(4)]
        elif m == 1:
            pred = [[clamp(L[y] + A[x] - P) for x in range(4)] for y in range(4)]
        elif m == 2:
            t = [avg3(P, A[0], A[1]), avg3(A[0], A[1], A[2]), avg3(A[1], A[2], A[3]), avg3(A[2], A[3], E[4])]
            pred = [t[:] for _ in range(4)]
        elif m == 3:
            t = [avg3(P, L[0], L[1]), avg3(L[0], L[1], L[2]), avg3(L[1], L[2], L[3]), avg3(L[2], L[3], L[3])]
            pred = [[t[y]] * 4 for y in range(4)]
        elif m == 4:
            pred = [[avg3(S[3 + x - y], S[4 + x - y], S[5 + x - y]) for x in range(4)] for y in range(4)]
        elif m == 5:
            for y in range(4):
                for x in range(4):
                    if y >= 2 and x >= 1: pred[y][x] = pred[y - 2][x - 1]
                    elif y == 0: pred[y][x] = avg2(S[4 + x], S[5 + x])
                    elif y == 1: pred[y][x] = avg3(S[3 + x], S[4 + x], S[5 + x])
                    elif y == 2: pred[y][x] = avg3(S[2], S[3], S[4])
                    else: pred[y][x] = avg3(S[1], S[2], S[3])
        elif m == 6:
            for y in range(4):
                for x in range(4):
                    i = x + y
                    pred[y][x] = avg3(E[i], E[i + 1], E[i + 2]) if i < 6 else avg3(E[6], E[7], E[7])
        elif m == 7:
            for y in range(4):
                for x in range(4):
                    i = x + (y >> 1)
                    pred[y][x] = avg3(E[i], E[i + 1], E[i + 2]) if y & 1 else avg2(E[i], E[i + 1])
            pred[2][3] = avg3(E[4], E[5], E[6]); pred[3][3] = avg3(E[5], E[6], E[7])
        elif m == 8:
            for y in range(4):
                for x in range(4):
                    if x >= 2:
                        pred[y][x] = pred[y - 1][x - 2] if y >= 1 else avg3(S[2 + x], S[3 + x], S[4 + x])
                    elif x == 0: pred[y][x] = avg2(S[3 - y], S[4 - y])
                    else: pred[y][x] = avg3(S[3 - y], S[4 - y], S[5 - y])
        else:
            for y in range(4):
                for x in range(4):
                    i = x + 2 * y
                    if i < 5:
                        pred[y][x] = (avg3(L[i >> 1], L[(i >> 1) + 1], L[(i >> 1) + 2] if (i >> 1) + 2 < 4 else L[3])
                                      if i & 1 else avg2(L[i >> 1], L[(i >> 1) + 1]))
                    elif i == 5: pred[y][x] = avg3(L[2], L[3], L[3])
                    else: pred[y][x] = L[3]
        sy = 0; es = 0
        for y in range(4):
            for x in range(4):
                p = clamp(pred[y][x] + r[y * 4 + x])
                sy += p
                if x % 2 == 0 and y % 2 == 0:
                    es += p
        # chroma: uv DC mode, no coeffs -> 128 over 2x2 visible
        return (4, 4, sy, 128 * 4, 128 * 4, es)
    # v == 3: constant propagation over 2x2 grid
    def mbconst(mode, above, left, corner, avail_a, avail_l, n):
        if mode == 0:
            if not avail_a and not avail_l: return 128
            if not avail_a: return (n * left + (n >> 1)) >> (4 if n == 16 else 3)
            if not avail_l: return (n * above + (n >> 1)) >> (4 if n == 16 else 3)
            return (n * above + n * left + n) >> (5 if n == 16 else 4)
        if mode == 1: return above
        if mode == 2: return left
        return clamp(left + above - corner)
    ym = [[(ki + 2 * r + c) % 4 for c in range(2)] for r in range(2)]
    um = [[(ki + r + 2 * c) % 4 for c in range(2)] for r in range(2)]
    def grid(modes, n):
        c00 = mbconst(modes[0][0], 127, 129, 127, False, False, n)
        c01 = mbconst(modes[0][1], 127, c00, 127, False, True, n)
        c10 = mbconst(modes[1][0], c00, 129, 129, True, False, n)
        c11 = mbconst(modes[1][1], c01, c10, c00, True, True, n)
        return c00, c01, c10, c11
    y00, y01, y10, y11 = grid(ym, 16)
    u00, u01, u10, u11 = grid(um, 8)
    sy = 256 * (y00 + y01 + y10 + y11)
    su = 64 * (u00 + u01 + u10 + u11)
    es = 64 * (y00 + y01 + y10 + y11)
    return (32, 32, sy, su, su, es)

def idct3_dc(dc, c1r):
    out = [0] * 16
    c1 = (c1r * 35468) >> 16
    d1 = c1r + ((c1r * 20091) >> 16)
    for r in range(4):
        out[4 * r + 0] = (dc + d1 + 4) >> 3
        out[4 * r + 1] = (dc + c1 + 4) >> 3
        out[4 * r + 2] = (dc - c1 + 4) >> 3
        out[4 * r + 3] = (dc - d1 + 4) >> 3
    return out

def lib_stats(data):
    r = libwebp_decode(data)
    if r is None:
        return None
    w, h, Yv, Uv, Vv = r
    sy = sum(sum(row) for row in Yv)
    su = sum(sum(row) for row in Uv)
    sv = sum(sum(row) for row in Vv)
    es = sum(Yv[y][x] for y in range(0, h, 2) for x in range(0, w, 2))
    return (w, h, sy, su, sv, es)

if __name__ == '__main__':
    fails = 0
    for ki in range(251):
        data, dims = fixture(ki)
        ls = lib_stats(data)
        osr = oracle_stats(ki)
        ms = None
        mine = decode_frame(data)
        w, h, Yv, Uv, Vv = mine
        sy = sum(sum(row) for row in Yv)
        su = sum(sum(row) for row in Uv)
        sv = sum(sum(row) for row in Vv)
        es = sum(Yv[y][x] for y in range(0, h, 2) for x in range(0, w, 2))
        ms = (w, h, sy, su, sv, es)
        if ls != osr or ms != osr:
            fails += 1
            print(f'ki={ki} v={ki%4}: lib={ls} oracle={osr} mine={ms}')
    print('fixture/oracle fails:', fails, '/251')
