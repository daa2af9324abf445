#!/usr/bin/env python3
"""VP8 intra (key-frame) prototype codec, RFC 6386.

Development tool only (driver-side python, like check_oracle.py): builds
fixture bitstreams and decodes them, differentially validated against the
system libwebp (WebPDecodeYUV via ctypes) before the Scala port is pinned.
Tables are the RFC 6386 normative constants (transcribed via
tools/vp8_tables.json).
"""
import json, os, ctypes, struct, sys

T = json.load(open(os.path.join(os.path.dirname(__file__), 'vp8_tables.json')))
COEFF_PROBS = T['coeff_probs']    # [4][8][3][11]
UPDATE_PROBS = T['update_probs']  # [4][8][3][11]
KF_BMODE = T['kf_bmode']          # [10][10][9]
DC_Q = T['dc_q']; AC_Q = T['ac_q']
ZIGZAG = T['zigzag']
BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

KF_YMODE_PROBS = [145, 156, 163, 128]
KF_UV_PROBS = [142, 114, 183]

# trees: pairs (left, right); negative = leaf value -1-v encoded as -(v)-? use (leaf, v)
# encode as list where leaf is ('L', value), internal node index even.
# kf y mode tree: B_PRED=4 (we number: DC=0,V=1,H=2,TM=3,B_PRED=4)
YMODE_TREE = [(-4, 2), (4, 6), (-0, -1), (-2, -3)]  # see encode/decode helpers
# representation: tree[i] = (a, b); a/b >= 0 -> child node index/2; negative -> leaf = -(x)-1
def _mk(pairs):
    out = []
    for a, b in pairs:
        out.append(a); out.append(b)
    return out

# standard tree representation like RFC: negative entries are -leaf
KF_YMODE_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]      # leaf 4=B_PRED,0=DC,1=V,2=H,3=TM
UV_TREE = [-0, 2, -1, 4, -2, -3]                   # DC,V,H,TM
BMODE_TREE = [-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9]
# mode numbering (tree-leaf order, as the kf_bmode table is indexed):
# 0=B_DC 1=B_TM 2=B_VE 3=B_HE 4=B_RD 5=B_VR 6=B_LD 7=B_VL 8=B_HD 9=B_HU
COEFF_TREE = [-11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6, 18, 20, -7, -8, -9, -10]
# tokens: 0..4 literal, 5=cat1,6=cat2,7=cat3,8=cat4,9=cat5,10=cat6, 11=EOB
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASE = [5, 7, 11, 19, 35, 67]

# ---------------------------------------------------------------- bool coder
class BoolEnc:
    def __init__(self):
        self.range = 255; self.bottom = 0; self.bit_count = 24; self.out = bytearray()
    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0; i -= 1
        self.out[i] += 1
    def put(self, prob, bit):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split; self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xffffffff
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xff)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)
    def tree(self, tree, probs, leaf):
        # walk from root matching leaf
        i = 0
        path = []
        def walk(i):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0 and -t == leaf and not (t == 0 and leaf != 0):
                    return [(i >> 1, b)]
                if t == 0 and leaf == 0 and i + b != 0:
                    # leaf 0 encoded as -0 == 0; only valid at odd positions? handle: t==0 treat as leaf 0
                    return [(i >> 1, b)]
                if t > 0:
                    r = walk(t)
                    if r is not None:
                        return [(i >> 1, b)] + r
            return None
        path = walk(0)
        assert path is not None, (tree, leaf)
        for pi, b in path:
            self.put(probs[pi], b)
    def flush(self):
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xffffffff
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xffffffff
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xff)
            v = (v << 8) & 0xffffffff
        return bytes(self.out)

class BoolDec:
    def __init__(self, buf, pos=0, end=None):
        self.buf = buf; self.pos = pos; self.end = len(buf) if end is None else end
        b0 = buf[self.pos] if self.pos < self.end else 0
        b1 = buf[self.pos + 1] if self.pos + 1 < self.end else 0
        self.value = (b0 << 8) | b1
        self.pos += 2
        self.range = 255; self.bit_count = 0
    def get(self, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        SPLIT = split << 8
        if self.value >= SPLIT:
            ret = 1; self.range -= split; self.value -= SPLIT
        else:
            ret = 0; self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xffffffff
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nb = self.buf[self.pos] if self.pos < self.end else 0
                self.pos += 1
                self.value |= nb
        return ret
    def literal(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v
    def tree(self, tree, probs, start=0):
        i = start
        while True:
            b = self.get(probs[i >> 1])
            t = tree[i + b]
            if t <= 0:
                return -t
            i = t

# ---------------------------------------------------------------- transforms
def idct4x4(blk):
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = blk[i], blk[4 + i], blk[8 + i], blk[12 + i]
        a1 = ip0 + ip8; b1 = ip0 - ip8
        t1 = (ip4 * 35468) >> 16
        t2 = ip12 + ((ip12 * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip4 + ((ip4 * 20091) >> 16)
        t2 = (ip12 * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1; tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1; tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        ip0, ip1, ip2, ip3 = tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        a1 = ip0 + ip2; b1 = ip0 - ip2
        t1 = (ip1 * 35468) >> 16
        t2 = ip3 + ((ip3 * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip1 + ((ip1 * 20091) >> 16)
        t2 = (ip3 * 35468) >> 16
        d1 = t1 + t2
        out[4 * i] = (a1 + d1 + 4) >> 3; out[4 * i + 3] = (a1 - d1 + 4) >> 3
        out[4 * i + 1] = (b1 + c1 + 4) >> 3; out[4 * i + 2] = (b1 - c1 + 4) >> 3
    return out

def iwht4x4(blk):
    tmp = [0] * 16
    for i in range(4):
        a1 = blk[i] + blk[12 + i]; b1 = blk[4 + i] + blk[8 + i]
        c1 = blk[4 + i] - blk[8 + i]; d1 = blk[i] - blk[12 + i]
        tmp[i] = a1 + b1; tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1; tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]; b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]; d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3; out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3; out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out

def clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)

def idct_in_envelope(blk):
    """True iff every iDCT intermediate stays within int16 — the envelope
    real encoders guarantee and SIMD decoders (incl. libwebp SSE2) assume.
    Fixtures must stay inside it for implementation-independent decode."""
    LIM = 32000
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = blk[i], blk[4 + i], blk[8 + i], blk[12 + i]
        a1 = ip0 + ip8; b1 = ip0 - ip8
        c1 = ((ip4 * 35468) >> 16) - (ip12 + ((ip12 * 20091) >> 16))
        d1 = (ip4 + ((ip4 * 20091) >> 16)) + ((ip12 * 35468) >> 16)
        for v in (a1 + d1, a1 - d1, b1 + c1, b1 - c1):
            if abs(v) > LIM: return False
        tmp[i] = a1 + d1; tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1; tmp[8 + i] = b1 - c1
    for i in range(4):
        ip0, ip1, ip2, ip3 = tmp[4 * i], tmp[4 * i + 1], tmp[4 * i + 2], tmp[4 * i + 3]
        a1 = ip0 + ip2; b1 = ip0 - ip2
        c1 = ((ip1 * 35468) >> 16) - (ip3 + ((ip3 * 20091) >> 16))
        d1 = (ip1 + ((ip1 * 20091) >> 16)) + ((ip3 * 35468) >> 16)
        for v in (a1 + d1 + 4, a1 - d1 + 4, b1 + c1 + 4, b1 - c1 + 4):
            if abs(v) > LIM: return False
    return True

def quantizers(qi, ydc_d=0, y2dc_d=0, y2ac_d=0, uvdc_d=0, uvac_d=0):
    def cl(x): return 0 if x < 0 else (127 if x > 127 else x)
    ydc = DC_Q[cl(qi + ydc_d)]
    yac = AC_Q[cl(qi)]
    y2dc = DC_Q[cl(qi + y2dc_d)] * 2
    y2ac = AC_Q[cl(qi + y2ac_d)] * 155 // 100
    if y2ac < 8: y2ac = 8
    uvdc = DC_Q[cl(qi + uvdc_d)]
    if uvdc > 132: uvdc = 132
    uvac = AC_Q[cl(qi + uvac_d)]
    return ydc, yac, y2dc, y2ac, uvdc, uvac

# ---------------------------------------------------------------- encoder
class MBPlan:
    """y_mode: 0=DC,1=V,2=H,3=TM,4=B_PRED; b_modes: 16 ints (if B_PRED);
    uv_mode: 0..3; skip: bool; coeffs: dict block_id -> {zigzag_pos: level}.
    block_id: 'y2', ('y',i) i in 0..15, ('u',i)/('v',i) i in 0..3."""
    def __init__(self, y_mode=0, b_modes=None, uv_mode=0, skip=False, coeffs=None):
        self.y_mode = y_mode
        self.b_modes = b_modes or [0] * 16
        self.uv_mode = uv_mode
        self.skip = skip
        self.coeffs = coeffs or {}

def encode_frame(w, h, mbs, qi=20, q_deltas=(0, 0, 0, 0, 0), skip_prob=170,
                 filter_level=0, filter_type=0, sharpness=0):
    """mbs: 2-D list [mb_row][mb_col] of MBPlan. Returns full WebP bytes."""
    mb_w = (w + 15) // 16; mb_h = (h + 15) // 16
    assert len(mbs) == mb_h and all(len(r) == mb_w for r in mbs)

    # envelope guard: every block's dequantized iDCT must keep int16
    # intermediates, like real encoder output does
    ydc, yac, y2dc, y2ac, uvdc, uvac = quantizers(qi, *q_deltas)
    for row in mbs:
        for mb in row:
            if mb.skip:
                continue
            wht = None
            if mb.y_mode != 4 and 'y2' in mb.coeffs:
                y2blk = [0] * 16
                for p, lv in mb.coeffs['y2'].items():
                    y2blk[ZIGZAG[p]] = lv * (y2dc if p == 0 else y2ac)
                assert all(abs(v) < 28000 for v in y2blk), 'y2 level too hot'
                wht = iwht4x4(y2blk)
            for bid, levels in mb.coeffs.items():
                if bid == 'y2':
                    continue
                plane = bid[0]
                dq, aq = (ydc, yac) if plane == 'y' else (uvdc, uvac)
                blk = [0] * 16
                for p, lv in levels.items():
                    blk[ZIGZAG[p]] = lv * (dq if p == 0 else aq)
                if plane == 'y' and wht is not None:
                    blk[0] = wht[bid[1]]
                assert idct_in_envelope(blk), f'fixture level outside int16 envelope: {bid} {levels}'

    # --- first partition: header + per-MB modes
    e = BoolEnc()
    e.put(128, 0)  # color space
    e.put(128, 0)  # clamping type
    e.put(128, 0)  # segmentation off
    e.put(128, filter_type & 1)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.put(128, 0)  # no lf delta
    e.literal(0, 2)  # log2(parts) = 0 -> 1 token partition
    e.literal(qi, 7)
    for d in q_deltas:
        if d == 0:
            e.put(128, 0)
        else:
            e.put(128, 1); e.literal(abs(d), 4); e.put(128, 1 if d < 0 else 0)
    e.put(128, 0)  # refresh entropy probs = 0
    # token prob updates: all zero
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    e.put(UPDATE_PROBS[((i * 8 + j) * 3 + k) * 11 + l], 0)
    e.put(128, 1)  # mb_no_coeff_skip
    e.literal(skip_prob, 8)

    # per-MB modes; track b-mode context (above/left subblock modes)
    above_sub = [[0] * 4 for _ in range(mb_w)]  # bottom row sub-modes per MB col
    for my in range(mb_h):
        left_sub = [0] * 4
        for mx in range(mb_w):
            mb = mbs[my][mx]
            e.put(skip_prob, 1 if mb.skip else 0)
            e.tree(KF_YMODE_TREE, KF_YMODE_PROBS, mb.y_mode)
            if mb.y_mode == 4:  # B_PRED
                for sy in range(4):
                    for sx in range(4):
                        above = above_sub[mx][sx] if sy == 0 else mb.b_modes[(sy - 1) * 4 + sx]
                        left = left_sub[sy] if sx == 0 else mb.b_modes[sy * 4 + sx - 1]
                        m = mb.b_modes[sy * 4 + sx]
                        probs = KF_BMODE[(above * 10 + left) * 9:(above * 10 + left) * 9 + 9]
                        e.tree(BMODE_TREE, probs, m)
                above_sub[mx] = mb.b_modes[12:16]
                left_sub = [mb.b_modes[3], mb.b_modes[7], mb.b_modes[11], mb.b_modes[15]]
            else:
                implied = {0: 0, 1: 2, 2: 3, 3: 1}[mb.y_mode]  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
                above_sub[mx] = [implied] * 4
                left_sub = [implied] * 4
            e.tree(UV_TREE, KF_UV_PROBS, mb.uv_mode)
    part1 = e.flush()

    # --- token partition
    t = BoolEnc()
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 Y cols, 2 U, 2 V, 1 Y2
    for my in range(mb_h):
        left_nz = [0] * 9
        for mx in range(mb_w):
            mb = mbs[my][mx]
            has_y2 = mb.y_mode != 4
            if mb.skip:
                for i in range(8):
                    above_nz[mx][i] = 0; left_nz[i] = 0
                if has_y2:
                    above_nz[mx][8] = 0; left_nz[8] = 0
                continue
            def put_block(btype, first, ctx, levels):
                # levels: dict zigzag_pos -> value; returns nnz flag
                nz = 0
                i = first
                node = 0
                while i < 16:
                    band = BANDS[i]
                    probs = COEFF_PROBS[((btype * 8 + band) * 3 + ctx) * 11:
                                        ((btype * 8 + band) * 3 + ctx) * 11 + 11]
                    v = levels.get(i, 0)
                    rest = any(levels.get(j, 0) for j in range(i, 16))
                    if not rest:
                        if node == 0:
                            t.tree(COEFF_TREE, probs, 11)  # EOB
                        break
                    # token for v
                    av = abs(v)
                    if av <= 4:
                        tok = av
                    else:
                        tok = None
                        for c in range(5, -1, -1):
                            if av >= CAT_BASE[c]:
                                tok = 5 + c
                                break
                    # encode tree from current node
                    self_tree_encode(t, probs, tok, node)
                    if tok >= 5:
                        c = tok - 5
                        extra = av - CAT_BASE[c]
                        nb = len(CAT_PROBS[c])
                        for bi in range(nb - 1, -1, -1):
                            t.put(CAT_PROBS[c][nb - 1 - bi], (extra >> bi) & 1)
                    if av:
                        t.put(128, 1 if v < 0 else 0)
                        nz = 1
                    ctx = 0 if av == 0 else (1 if av == 1 else 2)
                    node = 2 if av == 0 else 0
                    i += 1
                return nz
            def self_tree_encode(enc, probs, leaf, start):
                i = start
                # find path from start
                def walk(i):
                    for b in (0, 1):
                        tt = COEFF_TREE[i + b]
                        if tt <= 0:
                            if -tt == leaf:
                                return [(i >> 1, b)]
                        else:
                            r = walk(tt)
                            if r is not None:
                                return [(i >> 1, b)] + r
                    return None
                path = walk(i)
                assert path is not None
                for pi, b in path:
                    enc.put(probs[pi], b)
            if has_y2:
                ctx = above_nz[mx][8] + left_nz[8]
                nz = put_block(1, 0, ctx, mb.coeffs.get('y2', {}))
                above_nz[mx][8] = nz; left_nz[8] = nz
            first = 1 if has_y2 else 0
            btype = 0 if has_y2 else 3
            for sy in range(4):
                for sx in range(4):
                    a = above_nz[mx][sx] if sy == 0 else y_nz[(sy - 1) * 4 + sx]
                    l = left_nz[sy] if sx == 0 else y_nz[sy * 4 + sx - 1]
                    if sy == 0 and sx == 0:
                        y_nz = [0] * 16
                    nz = put_block(btype, first, a + l, mb.coeffs.get(('y', sy * 4 + sx), {}))
                    y_nz[sy * 4 + sx] = nz
            for sx in range(4):
                above_nz[mx][sx] = y_nz[12 + sx]
                left_nz[sx] = y_nz[4 * sx + 3]
            for pi, plane in ((4, 'u'), (6, 'v')):
                c_nz = [0] * 4
                for sy in range(2):
                    for sx in range(2):
                        a = above_nz[mx][pi + sx] if sy == 0 else c_nz[(sy - 1) * 2 + sx]
                        l = left_nz[pi + sy] if sx == 0 else c_nz[sy * 2 + sx - 1]
                        nz = put_block(2, 0, a + l, mb.coeffs.get((plane, sy * 2 + sx), {}))
                        c_nz[sy * 2 + sx] = nz
                above_nz[mx][pi] = c_nz[2]; above_nz[mx][pi + 1] = c_nz[3]
                left_nz[pi] = c_nz[1]; left_nz[pi + 1] = c_nz[3]
    part2 = t.flush()

    # --- assemble VP8 payload
    tag = 0  # keyframe
    tag |= (0 << 1)  # version
    tag |= (1 << 4)  # show frame
    tag |= (len(part1) << 5)
    payload = bytes([tag & 0xff, (tag >> 8) & 0xff, (tag >> 16) & 0xff])
    payload += bytes([0x9d, 0x01, 0x2a])
    payload += struct.pack('<H', w & 0x3fff)
    payload += struct.pack('<H', h & 0x3fff)
    payload += part1 + part2
    riff = b'VP8 ' + struct.pack('<I', len(payload)) + payload
    if len(payload) & 1:
        riff += b'\x00'
    out = b'RIFF' + struct.pack('<I', 4 + len(riff)) + b'WEBP' + riff
    return out

# ---------------------------------------------------------------- decoder
def decode_frame(data):
    """Full VP8-in-WebP intra decode -> (w, h, Y, U, V) planes (visible crop)."""
    assert data[:4] == b'RIFF' and data[8:12] == b'WEBP'
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]; sz = struct.unpack('<I', data[pos + 4:pos + 8])[0]
        if tag == b'VP8 ':
            payload = data[pos + 8:pos + 8 + sz]
            break
        pos += 8 + sz + (sz & 1)
    ft = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    assert (ft & 1) == 0, 'not a keyframe'
    part1_size = ft >> 5
    assert payload[3:6] == b'\x9d\x01\x2a'
    w = struct.unpack('<H', payload[6:8])[0] & 0x3fff
    h = struct.unpack('<H', payload[8:10])[0] & 0x3fff
    mb_w = (w + 15) // 16; mb_h = (h + 15) // 16
    d = BoolDec(payload, 10, 10 + part1_size)
    cs = d.get(128); cl_ = d.get(128)
    seg = d.get(128)
    seg_map_upd = 0
    seg_abs = 0
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_probs = [255, 255, 255]
    if seg:
        seg_map_upd = d.get(128)
        seg_data_upd = d.get(128)
        if seg_data_upd:
            seg_abs = d.get(128)
            for i in range(4):
                if d.get(128):
                    m = d.literal(7); sgn = d.get(128)
                    seg_q[i] = -m if sgn else m
            for i in range(4):
                if d.get(128):
                    m = d.literal(6); sgn = d.get(128)
                    seg_lf[i] = -m if sgn else m
        if seg_map_upd:
            for i in range(3):
                seg_probs[i] = d.literal(8) if d.get(128) else 255
    filter_type = d.get(128); filter_level = d.literal(6); sharp = d.literal(3)
    lf_adj = d.get(128)
    if lf_adj:
        if d.get(128):
            for _ in range(8):
                if d.get(128):
                    d.literal(6); d.get(128)
    log2p = d.literal(2); nparts = 1 << log2p
    qi = d.literal(7)
    deltas = []
    for _ in range(5):
        if d.get(128):
            m = d.literal(4); s = d.get(128)
            deltas.append(-m if s else m)
        else:
            deltas.append(0)
    def seg_quants(sid):
        base = qi
        if seg:
            base = seg_q[sid] if seg_abs else qi + seg_q[sid]
            base = 0 if base < 0 else (127 if base > 127 else base)
        return quantizers(base, *deltas)
    def seg_filter_level(sid):
        lv = filter_level
        if seg:
            lv = seg_lf[sid] if seg_abs else filter_level + seg_lf[sid]
            lv = 0 if lv < 0 else (63 if lv > 63 else lv)
        return lv
    ydc, yac, y2dc, y2ac, uvdc, uvac = seg_quants(0)
    d.get(128)  # refresh entropy
    probs = list(COEFF_PROBS)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    idx = ((i * 8 + j) * 3 + k) * 11 + l
                    if d.get(UPDATE_PROBS[idx]):
                        probs[idx] = d.literal(8)
    no_skip = d.get(128)
    skip_prob = d.literal(8) if no_skip else 0

    # token partitions
    tp_start = 10 + part1_size
    sizes = []
    if nparts > 1:
        for i in range(nparts - 1):
            o = tp_start + i * 3
            sizes.append(payload[o] | (payload[o + 1] << 8) | (payload[o + 2] << 16))
        tp_start += (nparts - 1) * 3
    parts = []
    off = tp_start
    for i in range(nparts):
        end = off + sizes[i] if i < len(sizes) else len(payload)
        parts.append(BoolDec(payload, off, end))
        off = end

    # planes with borders
    W = mb_w * 16; H = mb_h * 16
    CW = mb_w * 8; CH = mb_h * 8
    Y = [[0] * W for _ in range(H)]
    U = [[0] * CW for _ in range(CH)]
    V = [[0] * CW for _ in range(CH)]

    # mode pass state
    above_sub = [[0] * 4 for _ in range(mb_w)]
    modes = [[None] * mb_w for _ in range(mb_h)]
    for my in range(mb_h):
        left_sub = [0] * 4
        for mx in range(mb_w):
            sid = 0
            if seg and seg_map_upd:
                if d.get(seg_probs[0]):
                    sid = 2 + d.get(seg_probs[2])
                else:
                    sid = d.get(seg_probs[1])
            skip = d.get(skip_prob) if no_skip else 0
            ym = d.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            bmodes = [0] * 16
            if ym == 4:
                for sy in range(4):
                    for sx in range(4):
                        above = above_sub[mx][sx] if sy == 0 else bmodes[(sy - 1) * 4 + sx]
                        left = left_sub[sy] if sx == 0 else bmodes[sy * 4 + sx - 1]
                        p = KF_BMODE[(above * 10 + left) * 9:(above * 10 + left) * 9 + 9]
                        bmodes[sy * 4 + sx] = d.tree(BMODE_TREE, p)
                above_sub[mx] = bmodes[12:16]
                left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                implied = {0: 0, 1: 2, 2: 3, 3: 1}[ym]
                above_sub[mx] = [implied] * 4
                left_sub = [implied] * 4
            uvm = d.tree(UV_TREE, KF_UV_PROBS)
            modes[my][mx] = (skip, ym, bmodes, uvm, sid)

    # token + recon pass
    mb_filter_info = [[None] * mb_w for _ in range(mb_h)]
    above_nz = [[0] * 9 for _ in range(mb_w)]
    for my in range(mb_h):
        left_nz = [0] * 9
        td = parts[my % nparts]
        for mx in range(mb_w):
            skip, ym, bmodes, uvm, sid = modes[my][mx]
            ydc, yac, y2dc, y2ac, uvdc, uvac = seg_quants(sid)
            has_y2 = ym != 4
            coeffs = {}
            mb_nz = 0
            if skip:
                for i in range(8):
                    above_nz[mx][i] = 0; left_nz[i] = 0
                if has_y2:
                    above_nz[mx][8] = 0; left_nz[8] = 0
            else:
                def get_block(btype, first, ctx, dcq, acq):
                    out = [0] * 16
                    i = first
                    node = 0
                    nz = 0
                    while i < 16:
                        band = BANDS[i]
                        pb = probs[((btype * 8 + band) * 3 + ctx) * 11:
                                   ((btype * 8 + band) * 3 + ctx) * 11 + 11]
                        tok = td.tree(COEFF_TREE, pb, node)
                        if tok == 11:
                            break
                        if tok == 0:
                            ctx = 0; node = 2; i += 1
                            continue
                        if tok <= 4:
                            av = tok
                        else:
                            c = tok - 5
                            extra = 0
                            for pp in CAT_PROBS[c]:
                                extra = (extra << 1) | td.get(pp)
                            av = CAT_BASE[c] + extra
                        sign = td.get(128)
                        v = -av if sign else av
                        out[ZIGZAG[i]] = v * (dcq if i == 0 else acq)
                        nz = 1
                        ctx = 1 if av == 1 else 2
                        node = 0
                        i += 1
                    return out, nz
                if has_y2:
                    ctx = above_nz[mx][8] + left_nz[8]
                    y2blk, nz = get_block(1, 0, ctx, y2dc, y2ac)
                    mb_nz |= nz
                    above_nz[mx][8] = nz; left_nz[8] = nz
                    wht = iwht4x4(y2blk)
                else:
                    wht = None
                first = 1 if has_y2 else 0
                btype = 0 if has_y2 else 3
                y_nz = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        a = above_nz[mx][sx] if sy == 0 else y_nz[(sy - 1) * 4 + sx]
                        l = left_nz[sy] if sx == 0 else y_nz[sy * 4 + sx - 1]
                        blk, nz = get_block(btype, first, a + l, ydc, yac)
                        if wht is not None:
                            blk[0] = wht[sy * 4 + sx]
                        coeffs[('y', sy * 4 + sx)] = blk
                        mb_nz |= nz
                        y_nz[sy * 4 + sx] = nz
                for sx in range(4):
                    above_nz[mx][sx] = y_nz[12 + sx]
                    left_nz[sx] = y_nz[4 * sx + 3]
                for pi, plane in ((4, 'u'), (6, 'v')):
                    c_nz = [0] * 4
                    for sy in range(2):
                        for sx in range(2):
                            a = above_nz[mx][pi + sx] if sy == 0 else c_nz[(sy - 1) * 2 + sx]
                            l = left_nz[pi + sy] if sx == 0 else c_nz[sy * 2 + sx - 1]
                            blk, nz = get_block(2, 0, a + l, uvdc, uvac)
                            mb_nz |= nz
                            coeffs[(plane, sy * 2 + sx)] = blk
                            c_nz[sy * 2 + sx] = nz
                    above_nz[mx][pi] = c_nz[2]; above_nz[mx][pi + 1] = c_nz[3]
                    left_nz[pi] = c_nz[1]; left_nz[pi + 1] = c_nz[3]

            mb_filter_info[my][mx] = (seg_filter_level(sid), ym, mb_nz)

            # ---- reconstruction
            bx = mx * 16; by = my * 16
            def ypix(x, y):
                if y < 0:
                    if x < 0:
                        # above-left corner
                        if by + y < 0: return 127
                        if bx + x < 0: return 129
                        return Y[by + y][bx + x]
                    if by + y < 0: return 127
                    if bx + x >= W: return Y[by + y][W - 1] if False else Y[by + y][bx + x] if bx + x < W else 127
                    return Y[by + y][bx + x]
                if x < 0:
                    if bx + x < 0: return 129
                    return Y[by + y][bx + x]
                return Y[by + y][bx + x]
            def resid(blkid, x, y):
                blk = coeffs.get(blkid)
                if blk is None:
                    return 0
                return idct_cache(blkid, blk)[y * 4 + x]
            idct_memo = {}
            def idct_cache(blkid, blk):
                r = idct_memo.get(blkid)
                if r is None:
                    r = idct4x4(blk); idct_memo[blkid] = r
                return r
            if ym == 4:
                # B_PRED: per-subblock sequential predict + reconstruct
                for sy in range(4):
                    for sx in range(4):
                        pred = bpred4(Y, W, H, bx + sx * 4, by + sy * 4,
                                      bmodes[sy * 4 + sx], mb_w, mx, sx, sy)
                        for yy in range(4):
                            for xx in range(4):
                                Y[by + sy * 4 + yy][bx + sx * 4 + xx] = clamp(
                                    pred[yy][xx] + resid(('y', sy * 4 + sx), xx, yy))
            else:
                pred = pred16(Y, W, bx, by, ym)
                for sy in range(4):
                    for sx in range(4):
                        for yy in range(4):
                            for xx in range(4):
                                Y[by + sy * 4 + yy][bx + sx * 4 + xx] = clamp(
                                    pred[sy * 4 + yy][sx * 4 + xx] +
                                    resid(('y', sy * 4 + sx), xx, yy))
            cbx = mx * 8; cby = my * 8
            for P, plane in ((U, 'u'), (V, 'v')):
                pred = pred8(P, CW, cbx, cby, uvm)
                for sy in range(2):
                    for sx in range(2):
                        for yy in range(4):
                            for xx in range(4):
                                P[cby + sy * 4 + yy][cbx + sx * 4 + xx] = clamp(
                                    pred[sy * 4 + yy][sx * 4 + xx] +
                                    resid((plane, sy * 2 + sx), xx, yy))

    if filter_level > 0 or seg:
        loop_filter(Y, U, V, mb_w, mb_h, filter_type, sharp, mb_filter_info)
    Yv = [row[:w] for row in Y[:h]]
    cw = (w + 1) // 2; ch = (h + 1) // 2
    Uv = [row[:cw] for row in U[:ch]]
    Vv = [row[:cw] for row in V[:ch]]
    return w, h, Yv, Uv, Vv

def _c(v):
    return -128 if v < -128 else (127 if v > 127 else v)

def loop_filter(Y, U, V, mb_w, mb_h, ftype, sharp, info):
    """RFC 6386 section 15: normal (ftype 0) and simple (ftype 1) loop
    filter, key-frame hev thresholds, raster MB order, vertical edges
    then horizontal per MB."""
    def filt_limits(level):
        i = level
        if sharp:
            i >>= 2 if sharp > 4 else 1
            if i > 9 - sharp:
                i = 9 - sharp
        if i < 1:
            i = 1
        hev = 0
        if level >= 40:
            hev = 2
        elif level >= 15:
            hev = 1
        return i, hev
    def normal_edge(get, put, n, mb_edge, E, I, H):
        for k in range(n):
            p3, p2, p1, p0, q0, q1, q2, q3 = [get(k, j) for j in range(-4, 4)]
            if (abs(p0 - q0) * 2 + abs(p1 - q1) // 2) > E:
                continue
            if (abs(p3 - p2) > I or abs(p2 - p1) > I or abs(p1 - p0) > I or
                    abs(q3 - q2) > I or abs(q2 - q1) > I or abs(q1 - q0) > I):
                continue
            hev = abs(p1 - p0) > H or abs(q1 - q0) > H
            P1, P0, Q0, Q1, P2, Q2 = (p1 - 128, p0 - 128, q0 - 128, q1 - 128,
                                      p2 - 128, q2 - 128)
            if mb_edge:
                if not hev:
                    w_ = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
                    a = _c((27 * w_ + 63) >> 7)
                    put(k, 0, clamp(Q0 - a + 128)); put(k, -1, clamp(P0 + a + 128))
                    a = _c((18 * w_ + 63) >> 7)
                    put(k, 1, clamp(Q1 - a + 128)); put(k, -2, clamp(P1 + a + 128))
                    a = _c((9 * w_ + 63) >> 7)
                    put(k, 2, clamp(Q2 - a + 128)); put(k, -3, clamp(P2 + a + 128))
                else:
                    a = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
                    F = _c(a + 4) >> 3
                    Ee = _c(a + 3) >> 3
                    put(k, 0, clamp(Q0 - F + 128)); put(k, -1, clamp(P0 + Ee + 128))
            else:
                a = _c((_c(P1 - Q1) if hev else 0) + 3 * (Q0 - P0))
                F = _c(a + 4) >> 3
                Ee = _c(a + 3) >> 3
                put(k, 0, clamp(Q0 - F + 128)); put(k, -1, clamp(P0 + Ee + 128))
                if not hev:
                    a2 = (F + 1) >> 1
                    put(k, 1, clamp(Q1 - a2 + 128)); put(k, -2, clamp(P1 + a2 + 128))
    def simple_edge(get, put, n, E):
        for k in range(n):
            p1, p0, q0, q1 = get(k, -2), get(k, -1), get(k, 0), get(k, 1)
            if (abs(p0 - q0) * 2 + abs(p1 - q1) // 2) > E:
                continue
            P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
            a = _c(_c(P1 - Q1) + 3 * (Q0 - P0))
            F = _c(a + 4) >> 3
            Ee = _c(a + 3) >> 3
            put(k, 0, clamp(Q0 - F + 128)); put(k, -1, clamp(P0 + Ee + 128))
    for my in range(mb_h):
        for mx in range(mb_w):
            level, ym, mb_nz = info[my][mx]
            if level == 0:
                continue
            I, H = filt_limits(level)
            E_mb = (level + 2) * 2 + I
            E_sb = level * 2 + I
            skip_sub = (not mb_nz) and ym != 4
            def vget(P, x0, y0):
                return lambda k, j: P[y0 + k][x0 + j]
            def vput(P, x0, y0):
                def f(k, j, v): P[y0 + k][x0 + j] = v
                return f
            def hget(P, x0, y0):
                return lambda k, j: P[y0 + j][x0 + k]
            def hput(P, x0, y0):
                def f(k, j, v): P[y0 + j][x0 + k] = v
                return f
            bx, by = mx * 16, my * 16
            cx, cy = mx * 8, my * 8
            if ftype == 1:
                if mx > 0:
                    simple_edge(vget(Y, bx, by), vput(Y, bx, by), 16, E_mb)
                if not skip_sub:
                    for sx in (4, 8, 12):
                        simple_edge(vget(Y, bx + sx, by), vput(Y, bx + sx, by), 16, E_sb)
                if my > 0:
                    simple_edge(hget(Y, bx, by), hput(Y, bx, by), 16, E_mb)
                if not skip_sub:
                    for sy in (4, 8, 12):
                        simple_edge(hget(Y, bx, by + sy), hput(Y, bx, by + sy), 16, E_sb)
                continue
            if mx > 0:
                normal_edge(vget(Y, bx, by), vput(Y, bx, by), 16, True, E_mb, I, H)
                normal_edge(vget(U, cx, cy), vput(U, cx, cy), 8, True, E_mb, I, H)
                normal_edge(vget(V, cx, cy), vput(V, cx, cy), 8, True, E_mb, I, H)
            if not skip_sub:
                for sx in (4, 8, 12):
                    normal_edge(vget(Y, bx + sx, by), vput(Y, bx + sx, by), 16, False, E_sb, I, H)
                normal_edge(vget(U, cx + 4, cy), vput(U, cx + 4, cy), 8, False, E_sb, I, H)
                normal_edge(vget(V, cx + 4, cy), vput(V, cx + 4, cy), 8, False, E_sb, I, H)
            if my > 0:
                normal_edge(hget(Y, bx, by), hput(Y, bx, by), 16, True, E_mb, I, H)
                normal_edge(hget(U, cx, cy), hput(U, cx, cy), 8, True, E_mb, I, H)
                normal_edge(hget(V, cx, cy), hput(V, cx, cy), 8, True, E_mb, I, H)
            if not skip_sub:
                for sy in (4, 8, 12):
                    normal_edge(hget(Y, bx, by + sy), hput(Y, bx, by + sy), 16, False, E_sb, I, H)
                normal_edge(hget(U, cx, cy + 4), hput(U, cx, cy + 4), 8, False, E_sb, I, H)
                normal_edge(hget(V, cx, cy + 4), hput(V, cx, cy + 4), 8, False, E_sb, I, H)

def edge(P, stride_w, bx, by, n):
    """above row [0..n-1], left col [0..n-1], corner; with VP8 borders."""
    def px(x, y):
        if y < 0:
            if by == 0:
                return 127  # whole above row incl corner when top row
            if x < 0:
                return 129 if bx == 0 else P[by - 1][bx - 1]
            if bx + x >= stride_w:
                return P[by - 1][stride_w - 1]
            return P[by - 1][bx + x]
        if x < 0:
            return 129 if bx == 0 else P[by + y][bx - 1]
        return P[by + y][bx + x]
    above = [px(i, -1) for i in range(n)]
    left = [px(-1, i) for i in range(n)]
    corner = px(-1, -1)
    return above, left, corner

def dcpred(above, left, bx, by, n, shiftbase):
    if by == 0 and bx == 0:
        return 128
    if by == 0:
        s = sum(left) + (n >> 1)
        return s >> (shiftbase - 1)
    if bx == 0:
        s = sum(above) + (n >> 1)
        return s >> (shiftbase - 1)
    s = sum(above) + sum(left) + n
    return s >> shiftbase

def pred16(Y, W, bx, by, mode):
    above, left, corner = edge(Y, W, bx, by, 16)
    out = [[0] * 16 for _ in range(16)]
    if mode == 0:
        v = dcpred(above, left, bx, by, 16, 5)
        for y in range(16):
            for x in range(16):
                out[y][x] = v
    elif mode == 1:
        for y in range(16):
            for x in range(16):
                out[y][x] = above[x]
    elif mode == 2:
        for y in range(16):
            for x in range(16):
                out[y][x] = left[y]
    else:
        for y in range(16):
            for x in range(16):
                out[y][x] = clamp(left[y] + above[x] - corner)
    return out

def pred8(P, CW, bx, by, mode):
    above, left, corner = edge(P, CW, bx, by, 8)
    out = [[0] * 8 for _ in range(8)]
    if mode == 0:
        v = dcpred(above, left, bx, by, 8, 4)
        for y in range(8):
            for x in range(8):
                out[y][x] = v
    elif mode == 1:
        for y in range(8):
            for x in range(8):
                out[y][x] = above[x]
    elif mode == 2:
        for y in range(8):
            for x in range(8):
                out[y][x] = left[y]
    else:
        for y in range(8):
            for x in range(8):
                out[y][x] = clamp(left[y] + above[x] - corner)
    return out

def bpred4(Y, W, H, px_, py_, mode, mb_w, mx, sx, sy):
    """4x4 intra prediction at pixel (px_, py_). Mode numbering is the
    tree-leaf order: 0=DC 1=TM 2=VE 3=HE 4=RD 5=VR 6=LD 7=VL 8=HD 9=HU."""
    def getpx(x, y):
        if y < 0 and py_ + y < 0:
            return 127
        if x < 0 and px_ + x < 0:
            return 129
        if x >= 0 and y < 0 and px_ + x >= W:
            return 127
        return Y[py_ + y][px_ + x]
    A = [getpx(i, -1) for i in range(4)]
    L = [getpx(-1, i) for i in range(4)]
    P = getpx(-1, -1)
    if sx == 3:
        mby = py_ - sy * 4
        def arpx(i):
            x = px_ + 4 + i
            yy = mby - 1
            if yy < 0: return 127
            if x >= W: return Y[yy][W - 1]  # rightmost MB: replicate
            return Y[yy][x]
        AR = [arpx(i) for i in range(4)]
    else:
        AR = [getpx(4 + i, -1) for i in range(4)]
    out = [[0] * 4 for _ in range(4)]
    def avg3(a, b, c): return (a + 2 * b + c + 2) >> 2
    def avg2(a, b): return (a + b + 1) >> 1
    E = A + AR  # 8 above/above-right pixels
    S = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]  # corner fan
    if mode == 0:  # B_DC
        v = (sum(A) + sum(L) + 4) >> 3
        for y in range(4):
            for x in range(4):
                out[y][x] = v
    elif mode == 1:  # B_TM
        for y in range(4):
            for x in range(4):
                out[y][x] = clamp(L[y] + A[x] - P)
    elif mode == 2:  # B_VE
        t = [avg3(P, A[0], A[1]), avg3(A[0], A[1], A[2]), avg3(A[1], A[2], A[3]),
             avg3(A[2], A[3], AR[0])]
        for y in range(4):
            for x in range(4):
                out[y][x] = t[x]
    elif mode == 3:  # B_HE
        t = [avg3(P, L[0], L[1]), avg3(L[0], L[1], L[2]), avg3(L[1], L[2], L[3]),
             avg3(L[2], L[3], L[3])]
        for y in range(4):
            for x in range(4):
                out[y][x] = t[y]
    elif mode == 4:  # B_RD (down-right): diagonal fan over S
        for y in range(4):
            for x in range(4):
                i = 4 + x - y
                out[y][x] = avg3(S[i - 1], S[i], S[i + 1])
    elif mode == 5:  # B_VR
        for y in range(4):
            for x in range(4):
                if y >= 2 and x >= 1:
                    out[y][x] = out[y - 2][x - 1]
                elif y % 2 == 0:
                    # rows 0 (and the x=0 cells of row 2 handled below)
                    if y == 0:
                        out[y][x] = avg2(S[4 + x], S[5 + x])
                    else:  # y == 2, x == 0
                        out[y][x] = avg3(S[2], S[3], S[4])
                else:
                    if y == 1:
                        out[y][x] = avg3(S[3 + x], S[4 + x], S[5 + x])
                    else:  # y == 3, x == 0
                        out[y][x] = avg3(S[1], S[2], S[3])
    elif mode == 6:  # B_LD (down-left)
        for y in range(4):
            for x in range(4):
                i = x + y
                if i < 6:
                    out[y][x] = avg3(E[i], E[i + 1], E[i + 2])
                else:
                    out[y][x] = avg3(E[6], E[7], E[7])
    elif mode == 7:  # B_VL
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y & 1:
                    out[y][x] = avg3(E[i], E[i + 1], E[i + 2])
                else:
                    out[y][x] = avg2(E[i], E[i + 1])
        # VP8 quirk: the two bottom-right cells reach one pixel further
        out[2][3] = avg3(E[4], E[5], E[6])
        out[3][3] = avg3(E[5], E[6], E[7])
    elif mode == 8:  # B_HD
        for y in range(4):
            for x in range(4):
                if x >= 2:
                    out[y][x] = out[y - 1][x - 2] if y >= 1 else avg3(S[2 + x], S[3 + x], S[4 + x])
                elif x == 0:
                    out[y][x] = avg2(S[3 - y], S[4 - y])
                else:  # x == 1
                    out[y][x] = avg3(S[3 - y], S[4 - y], S[5 - y])
    elif mode == 9:  # B_HU
        for y in range(4):
            for x in range(4):
                i = x + 2 * y
                if i < 5:
                    if i & 1:
                        out[y][x] = avg3(L[i >> 1], L[(i >> 1) + 1],
                                         L[(i >> 1) + 2] if (i >> 1) + 2 < 4 else L[3])
                    else:
                        out[y][x] = avg2(L[i >> 1], L[(i >> 1) + 1])
                elif i == 5:
                    out[y][x] = avg3(L[2], L[3], L[3])
                else:
                    out[y][x] = L[3]
    return out

# ---------------------------------------------------------------- referee
_lw = ctypes.CDLL('/usr/lib/x86_64-linux-gnu/libwebp.so.7')
_lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
_lw.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def libwebp_decode(data):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = _lw.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        return None
    W, H = w.value, h.value
    cw = (W + 1) // 2; ch = (H + 1) // 2
    Yv = [[y[r * stride.value + c] for c in range(W)] for r in range(H)]
    Uv = [[u[r * uv_stride.value + c] for c in range(cw)] for r in range(ch)]
    Vv = [[v[r * uv_stride.value + c] for c in range(cw)] for r in range(ch)]
    _lw.WebPFree(y)
    return W, H, Yv, Uv, Vv

def compare(data, label=''):
    ref = libwebp_decode(data)
    if ref is None:
        print(f'{label}: libwebp REJECTED stream'); return False
    mine = decode_frame(data)
    ok = True
    for name, a, b in (('Y', ref[2], mine[2]), ('U', ref[3], mine[3]), ('V', ref[4], mine[4])):
        if a != b:
            ok = False
            # first mismatch
            for r, (ra, rb) in enumerate(zip(a, b)):
                if ra != rb:
                    c = next(i for i in range(len(ra)) if ra[i] != rb[i])
                    print(f'{label}: {name} mismatch at ({c},{r}): lib={ra[c]} mine={rb[c]}')
                    break
    if ok:
        print(f'{label}: OK ({ref[0]}x{ref[1]})')
    return ok

if __name__ == '__main__':
    # smoke: single MB, DC mode, no residual
    mb = MBPlan(y_mode=0, uv_mode=0, skip=True)
    data = encode_frame(16, 16, [[mb]])
    open('/tmp/t0.webp', 'wb').write(data)
    compare(data, 'smoke-dc-skip')
