#!/usr/bin/env python3
"""Brotli referee + public-data extraction for the x23 decoder.

Everything this script touches is PUBLIC data: the RFC 7932 static
dictionary (Appendix A), the 121 word transforms (Appendix B), and the
context lookup tables (section 7.1), all as shipped in the system
libbrotli (BSD-licensed reference implementation of the RFC).

Subcommands:
  dump-dict OUT.bin          extract the 122,784-byte static dictionary
  dump-transforms OUT.tsv    deduce the (prefix, type, suffix) table by
                             applying each transform to probe words via
                             BrotliTransformDictionaryWord
  dump-context OUT.bin       extract the 2048-byte context LUT table by
                             locating it in libbrotli rodata via its
                             computable LSB6/MSB6 1024-byte prefix
  golden DIR                 write golden (raw, compressed) fixture pairs
                             at qualities 1/5/9/11 for the decoder spec
  compress Q IN OUT          one-shot referee compression
  decompress IN OUT          one-shot referee decompression
"""
import ctypes, ctypes.util, json, os, struct, sys

LIBDIR = "/usr/lib/x86_64-linux-gnu"
common = ctypes.CDLL(os.path.join(LIBDIR, "libbrotlicommon.so.1"))
enc = ctypes.CDLL(os.path.join(LIBDIR, "libbrotlienc.so.1"))
dec = ctypes.CDLL(os.path.join(LIBDIR, "libbrotlidec.so.1"))


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)


def get_dict():
    d = common.BrotliGetDictionary().contents
    data = bytes(bytearray(d.data[i] for i in range(d.data_size)))
    bits = list(d.size_bits_by_length)
    offs = list(d.offsets_by_length)
    return data, bits, offs


def dump_dict(out):
    data, bits, offs = get_dict()
    assert len(data) == 122784, len(data)
    with open(out, "wb") as f:
        f.write(data)
    # sanity: RFC 7932 section 8 word-count bits for lengths 4..24
    rfc_bits = [0]*4 + [10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5] + [0]*7
    assert bits == rfc_bits, (bits, rfc_bits)
    print(f"wrote {out}: {len(data)} bytes; size_bits ok")


def transform_word(word, idx):
    # int BrotliTransformDictionaryWord(uint8_t* dst, const uint8_t* word,
    #                                   int len, const BrotliTransforms*, int)
    common.BrotliGetTransforms.restype = ctypes.c_void_p
    t = common.BrotliGetTransforms()
    dst = ctypes.create_string_buffer(len(word) + 64)
    n = common.BrotliTransformDictionaryWord(
        dst, word, ctypes.c_int(len(word)), ctypes.c_void_p(t), ctypes.c_int(idx))
    return dst.raw[:n]


def deduce_transforms(out):
    """Apply every transform to probe words and recover (prefix, kind, suffix).

    kinds: 0 identity, 1 ferment-first, 2 ferment-all, 10+N omit-first-N,
    20+N omit-last-N (N 1..9). Probes are chosen so the kinds separate:
    distinct lowercase letters make case changes and omissions visible.
    """
    w1 = b"abcdefghijklmnop"   # 16 distinct lowercase
    w2 = b"qrstuvwxyz012345"   # different content, same length
    rows = []
    for i in range(121):
        o1 = transform_word(w1, i)
        o2 = transform_word(w2, i)
        kind = pre = suf = None
        for k in range(0, 30):
            if k == 0:
                c1, c2 = w1, w2
            elif k == 1:
                c1 = bytes([w1[0] ^ 32]) + w1[1:]
                c2 = bytes([w2[0] ^ 32]) + w2[1:]
            elif k == 2:
                c1 = bytes(b ^ 32 if 97 <= b <= 122 else b for b in w1)
                c2 = bytes(b ^ 32 if 97 <= b <= 122 else b for b in w2)
            elif 10 <= k <= 18:
                n = k - 9
                c1, c2 = w1[n:], w2[n:]
            elif 20 <= k <= 28:
                n = k - 19
                c1, c2 = w1[:-n], w2[:-n]
            else:
                continue
            p1 = o1.find(c1)
            p2 = o2.find(c2)
            if p1 >= 0 and p2 == p1 and o1[:p1] == o2[:p1] and \
               o1[p1 + len(c1):] == o2[p2 + len(c2):]:
                kind = k
                pre = o1[:p1]
                suf = o1[p1 + len(c1):]
                break
        assert kind is not None, (i, o1, o2)
        rows.append((pre, kind, suf))
    # length-prefixed binary (prefixes/suffixes may contain \n, quotes…):
    # u8 prefix_len, prefix, u8 kind, u8 suffix_len, suffix — ×121
    with open(out, "wb") as f:
        for pre, kind, suf in rows:
            f.write(bytes([len(pre)]) + pre + bytes([kind, len(suf)]) + suf)
    print(f"wrote {out}: 121 transforms "
          f"({sum(1 for r in rows if r[1]==0)} identity)")


def dump_context(out):
    """Locate the 2048-byte context LUT in libbrotli rodata.

    Layout (common/context.h): 512 bytes per mode (lut0 + lut1), modes
    LSB6, MSB6, UTF8, SIGNED. The first 1024 bytes are computable
    (LSB6: i & 63 then zeros; MSB6: i >> 2 then zeros), which pins the
    table's location; the UTF8 + SIGNED halves are then extracted.
    """
    prefix = bytes((i & 63) for i in range(256)) + bytes(256) + \
             bytes((i >> 2) for i in range(256)) + bytes(256)
    hits = []
    for lib in ("libbrotlicommon.so.1", "libbrotlidec.so.1",
                "libbrotlienc.so.1"):
        blob = open(os.path.join(LIBDIR, lib), "rb").read()
        at = blob.find(prefix)
        if at >= 0:
            hits.append((lib, at, blob[at:at + 2048]))
    assert hits, "context LUT prefix not found in any libbrotli object"
    table = hits[0][2]
    # cross-check: every copy found must agree
    for lib, at, t in hits[1:]:
        assert t == table, f"context table disagrees in {lib}"
    # sanity on the SIGNED half: value 0 maps to 0, 255 maps to 7<<3 / 7
    signed0, signed1 = table[1536:1792], table[1792:2048]
    assert signed0[0] == 0 and signed0[255] == 7 << 3
    assert signed1[0] == 0 and signed1[255] == 7
    assert all(signed0[i] == signed1[i] << 3 for i in range(256))
    with open(out, "wb") as f:
        f.write(table)
    print(f"wrote {out}: 2048 bytes from {[h[0] for h in hits]}")


def brotli_compress(data, quality):
    n = ctypes.c_size_t(len(data) + 1024 + len(data) // 2)
    buf = ctypes.create_string_buffer(n.value)
    ok = enc.BrotliEncoderCompress(
        ctypes.c_int(quality), ctypes.c_int(22), ctypes.c_int(0),
        ctypes.c_size_t(len(data)), data, ctypes.byref(n), buf)
    assert ok == 1
    return buf.raw[:n.value]


def brotli_decompress(data, cap=1 << 26):
    n = ctypes.c_size_t(cap)
    buf = ctypes.create_string_buffer(n.value)
    r = dec.BrotliDecoderDecompress(
        ctypes.c_size_t(len(data)), data, ctypes.byref(n), buf)
    assert r == 1, f"referee decode failed: {r}"
    return buf.raw[:n.value]


def golden(outdir):
    os.makedirs(outdir, exist_ok=True)
    import random
    rnd = random.Random(251)
    fixtures = []
    # text that exercises UTF8 context mode + the static dictionary
    words = ("the of and a to in is that for it as was with be by on not "
             "he this are or his from at which but have an had they you "
             "were their one all we can her has there been if more when "
             "will would who so no time information public should very "
             "data license under world example available function").split()
    for i in range(24):
        k = rnd.randrange(3)
        if k == 0:  # english-ish text (dictionary + UTF8 contexts)
            n = rnd.randrange(30, 700)
            s = " ".join(rnd.choice(words) for _ in range(n))
            if rnd.random() < 0.5:
                s = s.capitalize() + ". More: http://www.example.com/path?q=1"
            data = s.encode("utf-8")
        elif k == 1:  # repetitive structured data (backward refs, blocks)
            row = b"id=%04d;name=item;price=%03d\n"
            data = b"".join(row % (j, (j * 7) % 997)
                            for j in range(rnd.randrange(10, 400)))
        else:  # binary-ish (all byte values, signed/LSB contexts)
            data = bytes(rnd.randrange(256)
                         for _ in range(rnd.randrange(20, 3000)))
        for q in (1, 5, 9, 11):
            fixtures.append((data, q))
    # edge cases
    fixtures.append((b"", 11))
    fixtures.append((b"a", 11))
    fixtures.append((b"Hello, World! Hello, World!", 11))
    fixtures.append((bytes(range(256)) * 40, 9))
    fixtures.append((b"x" * 100000, 5))  # long runs
    # utf-8 multibyte (ferment 2/3-byte paths + utf8 contexts)
    fixtures.append(("naïve café über straße — ¡görüşürüz! ελληνικά "
                     "русский 中文 😀 the information of the world"
                     .encode("utf-8") * 20, 11))
    meta = []
    for i, (data, q) in enumerate(fixtures):
        comp = brotli_compress(data, q)
        assert brotli_decompress(comp) == data
        with open(f"{outdir}/g{i:03d}.raw", "wb") as f:
            f.write(data)
        with open(f"{outdir}/g{i:03d}.br", "wb") as f:
            f.write(comp)
        meta.append({"i": i, "quality": q, "raw_len": len(data),
                     "br_len": len(comp)})
    with open(f"{outdir}/goldens.json", "w") as f:
        json.dump(meta, f)
    print(f"wrote {len(fixtures)} golden pairs to {outdir}")


def main():
    cmd = sys.argv[1]
    if cmd == "dump-dict":
        dump_dict(sys.argv[2])
    elif cmd == "dump-transforms":
        deduce_transforms(sys.argv[2])
    elif cmd == "dump-context":
        dump_context(sys.argv[2])
    elif cmd == "golden":
        golden(sys.argv[2])
    elif cmd == "compress":
        data = open(sys.argv[3], "rb").read()
        out = brotli_compress(data, int(sys.argv[2]))
        open(sys.argv[4], "wb").write(out)
    elif cmd == "decompress":
        data = open(sys.argv[2], "rb").read()
        open(sys.argv[3], "wb").write(brotli_decompress(data))
    else:
        sys.exit(f"unknown subcommand {cmd}")


if __name__ == "__main__":
    main()
