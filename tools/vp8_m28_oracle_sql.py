#!/usr/bin/env python3
"""Generate + validate the m28 DuckDB oracle SQL.

Builds the analytic channel-sum SQL for the four VP8-intra fixture
regimes (mirroring vp8_m28_sim.oracle_stats), runs it in DuckDB over a
doc_id 0..250 sweep, and asserts equality with the sim's (already
libwebp-refereed) per-seed stats. The printed SQL is transcribed into
MultimodalQueries.m28's oracle verbatim (with `documents` as the table).
"""
import sys
sys.path.insert(0, '/root/repo/tools')
import duckdb
from vp8_m28_sim import oracle_stats
from vp8_proto import DC_Q, AC_Q

# ---- SQL fragment helpers (mirror Scala string builders 1:1) ----------

def lst(xs):
    return "[" + ",".join(str(x) for x in xs) + "]"

DCQ48 = lst(DC_Q[:48])
ACQ48 = lst(AC_Q[:48])

CLAMP = lambda e: f"least(255, greatest(0, {e}))"

def idct_term(dc, a, c, xx, yy):
    """(idct(dc@0, a@raster1, c@raster4))[yy*4+xx] as SQL, then +128 clamp."""
    t0 = (f"({dc}) + (CASE {yy} WHEN 0 THEN ({c}) + ((({c})*20091)>>16) "
          f"WHEN 1 THEN (({c})*35468)>>16 "
          f"WHEN 2 THEN -((({c})*35468)>>16) "
          f"ELSE -(({c}) + ((({c})*20091)>>16)) END)")
    ax = (f"(CASE {xx} WHEN 0 THEN ({a}) + ((({a})*20091)>>16) "
          f"WHEN 1 THEN (({a})*35468)>>16 "
          f"WHEN 2 THEN -((({a})*35468)>>16) "
          f"ELSE -(({a}) + ((({a})*20091)>>16)) END)")
    return CLAMP(f"128 + ((({t0}) + ({ax}) + 4) >> 3)")

# regime 0: Y = WHT-propagated DC + per-block (zz1, zz2) residual --------
def v0_y(evens_only):
    # pixel index p in 0..255 over the padded 16x16 MB; crop to (w,h)
    X, Y = "(p%16)", "(p//16)"
    b = f"(({Y}//4)*4 + ({X}//4))"
    dc = ("(CASE WHEN (p%16)//4 < 2 THEN (d0q + w1q + 3)>>3 "
          "ELSE (d0q - w1q + 3)>>3 END)")
    a = f"(((k + {b}) % 7) - 3) * yac"
    c = f"(((2*k + {b}) % 5) - 2) * yac"
    px = idct_term(dc, a, c, f"({X}%4)", f"({Y}%4)")
    vis = f"{X} < w AND {Y} < h"
    if evens_only:
        vis += f" AND {X}%2 = 0 AND {Y}%2 = 0"
    return (f"list_sum(list_transform(list_filter(range(0,256), p -> {vis}), "
            f"p -> {px}))")

def v0_uv(plane):
    X, Y = "(p%8)", "(p//8)"
    b = f"(({Y}//4)*2 + ({X}//4))"
    if plane == "u":
        d = f"(((k + {b}) % 5) - 2) * uvdc"
        a = f"(((k + 2*{b}) % 3) - 1) * uvac"
    else:
        d = f"(((2*k + {b}) % 5) - 2) * uvdc"
        a = f"(((k + {b}) % 3) - 1) * uvac"
    px = idct_term(d, a, "0", f"({X}%4)", f"({Y}%4)")
    vis = f"{X} < (w+1)//2 AND {Y} < (h+1)//2"
    return (f"list_sum(list_transform(list_filter(range(0,64), p -> {vis}), "
            f"p -> {px}))")

# regime 2: B_PRED sub-mode m over constant boundary → 10 constant grids
def bpred_grids():
    S = [129, 129, 129, 129, 127, 127, 127, 127, 127]
    E = [127] * 8
    L = [129] * 4
    A = [127] * 4
    P = 127
    def avg3(a, b, c): return (a + 2 * b + c + 2) >> 2
    def avg2(a, b): return (a + b + 1) >> 1
    def clamp(v): return 0 if v < 0 else (255 if v > 255 else v)
    grids = []
    for m in range(10):
        pred = [[0] * 4 for _ in range(4)]
        if m == 0:
            vv = (sum(A) + sum(L) + 4) >> 3
            pred = [[vv] * 4 for _ in range(4)]
        elif m == 1:
            pred = [[clamp(L[y] + A[x] - P) for x in range(4)] for y in range(4)]
        elif m == 2:
            t = [avg3(P, A[0], A[1]), avg3(A[0], A[1], A[2]),
                 avg3(A[1], A[2], A[3]), avg3(A[2], A[3], E[4])]
            pred = [t[:] for _ in range(4)]
        elif m == 3:
            t = [avg3(P, L[0], L[1]), avg3(L[0], L[1], L[2]),
                 avg3(L[1], L[2], L[3]), avg3(L[2], L[3], L[3])]
            pred = [[t[y]] * 4 for y in range(4)]
        elif m == 4:
            pred = [[avg3(S[3 + x - y], S[4 + x - y], S[5 + x - y])
                     for x in range(4)] for y in range(4)]
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
                    pred[y][x] = (avg3(E[i], E[i + 1], E[i + 2]) if i < 6
                                  else avg3(E[6], E[7], E[7]))
        elif m == 7:
            for y in range(4):
                for x in range(4):
                    i = x + (y >> 1)
                    pred[y][x] = (avg3(E[i], E[i + 1], E[i + 2]) if y & 1
                                  else avg2(E[i], E[i + 1]))
            pred[2][3] = avg3(E[4], E[5], E[6])
            pred[3][3] = avg3(E[5], E[6], E[7])
        elif m == 8:
            for y in range(4):
                for x in range(4):
                    if x >= 2:
                        pred[y][x] = (pred[y - 1][x - 2] if y >= 1
                                      else avg3(S[2 + x], S[3 + x], S[4 + x]))
                    elif x == 0: pred[y][x] = avg2(S[3 - y], S[4 - y])
                    else: pred[y][x] = avg3(S[3 - y], S[4 - y], S[5 - y])
        else:
            for y in range(4):
                for x in range(4):
                    i = x + 2 * y
                    if i < 5:
                        pred[y][x] = ((avg3(L[i >> 1], L[(i >> 1) + 1],
                                            L[(i >> 1) + 2] if (i >> 1) + 2 < 4 else L[3])
                                       if i & 1 else avg2(L[i >> 1], L[(i >> 1) + 1])))
                    elif i == 5: pred[y][x] = avg3(L[2], L[3], L[3])
                    else: pred[y][x] = L[3]
        grids.append([pred[y][x] for y in range(4) for x in range(4)])
    return grids

BPRED = "[" + ",".join(lst(g) for g in bpred_grids()) + "]"

def v2_y(evens_only):
    pred = f"({BPRED})[((k//4)%10)+1][p+1]"
    res = ("((dc2 + (CASE p%4 WHEN 0 THEN a2 + ((a2*20091)>>16) "
           "WHEN 1 THEN (a2*35468)>>16 WHEN 2 THEN -((a2*35468)>>16) "
           "ELSE -(a2 + ((a2*20091)>>16)) END) + 4) >> 3)")
    px = CLAMP(f"{pred} + {res}")
    src = ("list_filter(range(0,16), p -> p%4%2 = 0 AND (p//4)%2 = 0)"
           if evens_only else "range(0,16)")
    return f"list_sum(list_transform({src}, p -> {px}))"

# regime 3: constant-propagated 2x2 MB grid ------------------------------
# c00 depends only on the mode; c01/c10/c11 chain (mode0 reduces to the
# plain neighbor average because the planes are constant — see sim).
def v3_chain(mname):
    m = lambda r, c: f"(k + {2*r + c}) % 4" if mname == "y" else f"(k + {r + 2*c}) % 4"
    c00 = f"([128,127,129,129])[({m(0,0)})+1]"
    c01 = (f"(CASE {m(0,1)} WHEN 1 THEN 127 ELSE {mname}00 END)")
    c10 = (f"(CASE {m(1,0)} WHEN 2 THEN 129 ELSE {mname}00 END)")
    c11 = (f"(CASE {m(1,1)} WHEN 0 THEN ({mname}01 + {mname}10 + 1)>>1 "
           f"WHEN 1 THEN {mname}01 WHEN 2 THEN {mname}10 "
           f"ELSE least(255, greatest(0, {mname}10 + {mname}01 - {mname}00)) END)")
    return c00, c01, c10, c11

def build_sql(table="documents"):
    y00, y01, y10, y11 = v3_chain("y")
    u00, u01, u10, u11 = v3_chain("u")
    return f"""
WITH base AS (
  SELECT doc_id, doc_id % 251 AS k, (doc_id % 251) % 4 AS v
  FROM {table}),
r0 AS (
  SELECT doc_id, k, 16 - k%5 AS w, 16 - k%7 AS h,
         ({ACQ48})[(k%48)+1] AS yac,
         ((k%5) - 2) * (({DCQ48})[(k%48)+1] * 2) AS d0q,
         ((k%3) - 1) * greatest(8, ({ACQ48})[(k%48)+1] * 155 // 100) AS w1q,
         least(({DCQ48})[(k%48)+1], 132) AS uvdc,
         ({ACQ48})[(k%48)+1] AS uvac
  FROM base WHERE v = 0),
s0 AS (
  SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
         CAST({v0_y(False)} AS BIGINT) AS sum_y,
         CAST({v0_uv('u')} AS BIGINT) AS sum_u,
         CAST({v0_uv('v')} AS BIGINT) AS sum_v,
         CAST({v0_y(True)} AS BIGINT) AS even_sum
  FROM r0),
s1 AS (
  SELECT doc_id,
         16::BIGINT AS width, 16::BIGINT AS height,
         CAST(256 * ([128,127,129,129])[((k//4)%4)+1] AS BIGINT) AS sum_y,
         CAST(64 * ([128,127,129,129])[((k//16)%4)+1] AS BIGINT) AS sum_u,
         CAST(64 * ([128,127,129,129])[((k//16)%4)+1] AS BIGINT) AS sum_v,
         CAST(64 * ([128,127,129,129])[((k//4)%4)+1] AS BIGINT) AS even_sum
  FROM base WHERE v = 1),
r2 AS (
  SELECT doc_id, k,
         ((k%5) - 2) * ({DCQ48})[(k%32)+1] AS dc2,
         ((k%3) - 1) * ({ACQ48})[(k%32)+1] AS a2
  FROM base WHERE v = 2),
s2 AS (
  SELECT doc_id, 4::BIGINT AS width, 4::BIGINT AS height,
         CAST({v2_y(False)} AS BIGINT) AS sum_y,
         512::BIGINT AS sum_u, 512::BIGINT AS sum_v,
         CAST({v2_y(True)} AS BIGINT) AS even_sum
  FROM r2),
r3a AS (
  SELECT doc_id, k, {y00} AS y00, {u00} AS u00
  FROM base WHERE v = 3),
r3b AS (
  SELECT doc_id, k, y00, u00, {y01} AS y01, {y10} AS y10,
         {u01} AS u01, {u10} AS u10
  FROM r3a),
r3c AS (
  SELECT doc_id, y00 + y01 + y10 + ({y11}) AS ysum,
         u00 + u01 + u10 + ({u11}) AS usum
  FROM r3b),
s3 AS (
  SELECT doc_id, 32::BIGINT AS width, 32::BIGINT AS height,
         CAST(256 * ysum AS BIGINT) AS sum_y,
         CAST(64 * usum AS BIGINT) AS sum_u,
         CAST(64 * usum AS BIGINT) AS sum_v,
         CAST(64 * ysum AS BIGINT) AS even_sum
  FROM r3c)
SELECT * FROM s0 UNION ALL SELECT * FROM s1
UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
ORDER BY doc_id
""".strip()

if __name__ == "__main__":
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT range AS doc_id FROM range(0, 251)")
    sql = build_sql()
    rows = con.execute(sql).fetchall()
    fails = 0
    for (doc_id, w, h, sy, su, sv, es) in rows:
        exp = oracle_stats(int(doc_id))
        got = (w, h, sy, su, sv, es)
        if tuple(got) != tuple(exp):
            fails += 1
            if fails < 10:
                print(f"doc_id={doc_id}: sql={got} sim={exp}")
    print("sql-vs-sim fails:", fails, "/", len(rows))
    if "--print" in sys.argv:
        print(sql)
