"""Levenshtein edit distance and alignment — host-side metric utilities
replacing the kaldialign C++ dependency (SURVEY.md §2.4; used at
ha/loop.py:376-401 and ha/wer.py:5).

``align(a, b, gap)`` returns the aligned pair list with ``gap`` filling
insertions/deletions; ``edit_distance`` returns the counts dict with the
same keys kaldialign produces.
"""


def _intern(a, b):
    """Map arbitrary hashable tokens of both sequences to int32 ids."""
    import numpy as np
    table = {}
    def ids(seq):
        out = np.empty(len(seq), np.int32)
        for i, t in enumerate(seq):
            out[i] = table.setdefault(t, len(table))
        return out
    return ids(a), ids(b)


def edit_distance(a, b):
    """dict with ins/del/sub/total like kaldialign.edit_distance.

    Uses the native C kernel (haloop_tpu/native/levenshtein.c) when
    available; pure-python fallback below is identical."""
    from haloop_tpu.native import library
    lib = library()
    if lib is not None and (len(a) + len(b)) > 64:
        import ctypes
        import numpy as np
        ia, ib = _intern(a, b)
        out = np.zeros(4, np.int32)
        rc = lib.edit_distance_i32(
            ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ia),
            ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ib),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc == 0:
            return {'ins': int(out[1]), 'del': int(out[2]),
                    'sub': int(out[3]), 'total': int(out[0])}
    return _edit_distance_py(a, b)


def _edit_distance_py(a, b):
    m, n = len(a), len(b)
    # dp over (cost, ins, dels, subs)
    prev = [(j, j, 0, 0) for j in range(n + 1)]
    for i in range(1, m + 1):
        cur = [(i, 0, i, 0)] + [None] * n
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1]
            else:
                sub = prev[j - 1]; dele = prev[j]; ins = cur[j - 1]
                best = min((sub[0] + 1, ins[0] + 1, dele[0] + 1))
                if best == sub[0] + 1:
                    cur[j] = (sub[0] + 1, sub[1], sub[2], sub[3] + 1)
                elif best == dele[0] + 1:
                    cur[j] = (dele[0] + 1, dele[1], dele[2] + 1, dele[3])
                else:
                    cur[j] = (ins[0] + 1, ins[1] + 1, ins[2], ins[3])
        prev = cur
    total, ins, dels, subs = prev[n]
    return {'ins': ins, 'del': dels, 'sub': subs, 'total': total}


def align(a, b, gap):
    """Minimal-edit alignment of two sequences; (gap, y) = insertion,
    (x, gap) = deletion. Mirrors kaldialign.align output ordering.
    Native C backtrace when available."""
    from haloop_tpu.native import library
    lib = library()
    if lib is not None and (len(a) + len(b)) > 64:
        import ctypes
        import numpy as np
        ia, ib = _intern(a, b)
        ops_a = np.zeros(len(a) + len(b) + 1, np.int32)
        ops_b = np.zeros(len(a) + len(b) + 1, np.int32)
        k = lib.align_i32(
            ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ia),
            ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ib),
            ops_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ops_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if k >= 0:
            return [(a[ops_a[i]] if ops_a[i] >= 0 else gap,
                     b[ops_b[i]] if ops_b[i] >= 0 else gap)
                    for i in range(k)]
    return _align_py(a, b, gap)


def _align_py(a, b, gap):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        ai = a[i - 1]
        row, prow = dp[i], dp[i - 1]
        for j in range(1, n + 1):
            cost = 0 if ai == b[j - 1] else 1
            row[j] = min(prow[j - 1] + cost, prow[j] + 1, row[j - 1] + 1)
    out = []
    i, j = m, n
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + (
                0 if a[i - 1] == b[j - 1] else 1):
            out.append((a[i - 1], b[j - 1]))
            i -= 1; j -= 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            out.append((a[i - 1], gap))
            i -= 1
        else:
            out.append((gap, b[j - 1]))
            j -= 1
    out.reverse()
    return out
