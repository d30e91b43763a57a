"""Levenshtein edit distance and alignment — host-side metric utilities
replacing the kaldialign C++ dependency (SURVEY.md §2.4; used at
ha/loop.py:376-401 and ha/wer.py:5).

``align(a, b, gap)`` returns the aligned pair list with ``gap`` filling
insertions/deletions; ``edit_distance`` returns the counts dict with the
same keys kaldialign produces.
"""


def edit_distance(a, b):
    """dict with ins/del/sub/total like kaldialign.edit_distance."""
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
    (x, gap) = deletion. Mirrors kaldialign.align output ordering."""
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
