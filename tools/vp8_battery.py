#!/usr/bin/env python3
"""Differential battery: my VP8 codec vs libwebp across every path."""
import sys, random
sys.path.insert(0, '/root/repo/tools')
from vp8_proto import *

fails = 0
def chk(data, label):
    global fails
    if not compare(data, label):
        fails += 1

# 1. 16x16 modes, single MB (no neighbors)
for m in range(4):
    chk(encode_frame(16, 16, [[MBPlan(y_mode=m, uv_mode=m % 4, skip=True)]]), f'16x16-mode{m}-solo')

# 2. 16x16 modes in a 3x3 MB grid (above/left/corner availability)
for m in range(4):
    grid = [[MBPlan(y_mode=(m + r + c) % 4, uv_mode=(m + 2 * r + c) % 4, skip=True)
             for c in range(3)] for r in range(3)]
    chk(encode_frame(48, 48, grid), f'16x16-grid{m}')

# 3. B_PRED: all 10 modes uniform, single MB
for m in range(10):
    chk(encode_frame(16, 16, [[MBPlan(y_mode=4, b_modes=[m] * 16, skip=True)]]), f'bpred-uniform{m}')

# 4. B_PRED: mixed modes
rnd = random.Random(7)
for t in range(5):
    bm = [rnd.randrange(10) for _ in range(16)]
    chk(encode_frame(16, 16, [[MBPlan(y_mode=4, b_modes=bm, skip=True)]]), f'bpred-mix{t}')

# 5. B_PRED 2x2 grid mixed with 16x16 MBs (b-mode contexts across MBs)
for t in range(5):
    grid = [[MBPlan(y_mode=4, b_modes=[rnd.randrange(10) for _ in range(16)], skip=True)
             if (r + c + t) % 2 == 0 else
             MBPlan(y_mode=rnd.randrange(4), skip=True)
             for c in range(2)] for r in range(2)]
    chk(encode_frame(32, 32, grid), f'bpred-grid{t}')

# 6. coefficients: Y2 DC only
chk(encode_frame(16, 16, [[MBPlan(y_mode=0, coeffs={'y2': {0: 3}})]]), 'y2-dc')
# 7. Y2 with ACs (WHT full)
chk(encode_frame(16, 16, [[MBPlan(y_mode=0, coeffs={'y2': {0: 2, 1: -1, 5: 3, 15: -2}})]]), 'y2-ac')
# 8. Y AC coefficients per subblock
co = {('y', i): {1 + (i % 3): (i % 5) - 2 or 1, 15: 1 if i % 4 == 0 else 0} for i in range(16)}
co['y2'] = {0: 1}
chk(encode_frame(16, 16, [[MBPlan(y_mode=1, coeffs=co)]]), 'y-ac-all-blocks')
# 9. chroma coefficients
co = {('u', i): {0: i + 1, 3: -1} for i in range(4)}
co.update({('v', i): {0: -(i + 1), 7: 2} for i in range(4)})
chk(encode_frame(16, 16, [[MBPlan(y_mode=0, uv_mode=3, coeffs=co)]]), 'uv-coeffs')
# 10. B_PRED with coefficients (type 3, coeff 0 present)
co = {('y', i): {0: (i % 7) - 3 or 2, 2: 1} for i in range(16)}
chk(encode_frame(16, 16, [[MBPlan(y_mode=4, b_modes=list(range(10)) + [0] * 6, coeffs=co)]]), 'bpred-coeffs')

# 11. token categories: levels hitting cat1..cat6 + extra bits + signs
for lvl in (1, 2, 3, 4, 5, 6, 7, 10, 11, 18, 19, 34, 35, 66, 67, 100, 300, 500, 700):
    # qi=4 keeps big cat5/cat6 levels inside the int16 iDCT envelope
    co = {'y2': {0: lvl}, ('y', 0): {1: -lvl}}
    chk(encode_frame(16, 16, [[MBPlan(y_mode=0, coeffs=co)]], qi=4), f'level{lvl}')

# 12. quantizer sweep incl. deltas
for qi in (0, 1, 17, 63, 100, 127):
    co = {'y2': {0: 2, 3: 1}, ('y', 5): {4: -2}, ('u', 1): {0: 1, 1: 1}}
    chk(encode_frame(16, 16, [[MBPlan(y_mode=0, coeffs=co)]], qi=qi), f'qi{qi}')
for dl in ((1, 0, 0, 0, 0), (0, -2, 3, 0, 0), (0, 0, 0, 5, -4), (15, -15, 15, -15, 15)):
    co = {'y2': {0: 2, 3: 1}, ('y', 5): {4: -2}, ('u', 1): {0: 1, 1: 1}}
    chk(encode_frame(16, 16, [[MBPlan(y_mode=0, coeffs=co)]], qi=40, q_deltas=dl), f'qd{dl}')

# 13. skip contexts: mixed skip / non-skip MBs with Y2 (nnz carry rules)
for t in range(6):
    grid = []
    for r in range(2):
        row = []
        for c in range(3):
            if (r * 3 + c + t) % 3 == 0:
                row.append(MBPlan(y_mode=0, skip=True))
            elif (r * 3 + c + t) % 3 == 1:
                row.append(MBPlan(y_mode=4, b_modes=[(t + c) % 10] * 16,
                                  coeffs={('y', i): {0: 1} for i in range(0, 16, 3)}))
            else:
                row.append(MBPlan(y_mode=0,
                                  coeffs={'y2': {0: 2}, ('y', 7): {3: 1}, ('v', 2): {0: -1}}))
        grid.append(row)
    chk(encode_frame(48, 32, grid), f'skipmix{t}')

# 14. non-multiple-of-16 dims (crop)
for (w, h) in ((12, 10), (17, 33), (31, 15), (4, 4), (8, 24), (20, 6)):
    mw = (w + 15) // 16; mh = (h + 15) // 16
    grid = [[MBPlan(y_mode=(r + c) % 4, uv_mode=(r + 2 * c) % 4,
                    coeffs={'y2': {0: 1}, ('y', (r + c) % 16): {2: 1}})
             for c in range(mw)] for r in range(mh)]
    chk(encode_frame(w, h, grid), f'crop{w}x{h}')

# 15. dense random coefficient storm (every band/ctx transition)
for t in range(8):
    rnd2 = random.Random(100 + t)
    grid = []
    for r in range(2):
        row = []
        for c in range(2):
            ym = rnd2.choice([0, 1, 2, 3, 4])
            co = {}
            if ym != 4:
                co['y2'] = {p: rnd2.randrange(-4, 5) for p in range(16) if rnd2.random() < 0.4}
            for i in range(16):
                co[('y', i)] = {p: rnd2.randrange(-9, 10) for p in
                                range(1 if ym != 4 else 0, 16) if rnd2.random() < 0.35}
            for pl in ('u', 'v'):
                for i in range(4):
                    co[(pl, i)] = {p: rnd2.randrange(-10, 11) for p in range(16)
                                   if rnd2.random() < 0.3}
            row.append(MBPlan(y_mode=ym, b_modes=[rnd2.randrange(10) for _ in range(16)],
                              uv_mode=rnd2.randrange(4), coeffs=co,
                              skip=rnd2.random() < 0.15))
        grid.append(row)
    chk(encode_frame(32, 32, grid, qi=rnd2.randrange(64)), f'storm{t}')

print('FAILS:', fails)
