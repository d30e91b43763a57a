/* Banded-free Levenshtein distance with ins/del/sub breakdown over
 * int32 token sequences. Native replacement for the kaldialign C++
 * dependency's edit_distance (SURVEY.md §2.4); called through ctypes
 * from haloop_tpu/align.py for large eval sets, with a pure-python
 * fallback when the shared object is unavailable.
 *
 * Build: cc -O3 -shared -fPIC -o libhalev.so levenshtein.c
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* dp cell packs (cost, ins, del, sub) as 4 x int32 */
typedef struct { int32_t cost, ins, del, sub; } cell;

/* out: int32[4] = {total, ins, del, sub}; returns 0 on success */
int edit_distance_i32(const int32_t *a, int64_t m, const int32_t *b,
                      int64_t n, int32_t *out) {
    cell *prev = malloc((size_t)(n + 1) * sizeof(cell));
    cell *cur = malloc((size_t)(n + 1) * sizeof(cell));
    if (!prev || !cur) { free(prev); free(cur); return -1; }

    for (int64_t j = 0; j <= n; j++) {
        prev[j].cost = (int32_t)j; prev[j].ins = (int32_t)j;
        prev[j].del = 0; prev[j].sub = 0;
    }
    for (int64_t i = 1; i <= m; i++) {
        cur[0].cost = (int32_t)i; cur[0].ins = 0;
        cur[0].del = (int32_t)i; cur[0].sub = 0;
        int32_t ai = a[i - 1];
        for (int64_t j = 1; j <= n; j++) {
            if (ai == b[j - 1]) {
                cur[j] = prev[j - 1];
                continue;
            }
            int32_t csub = prev[j - 1].cost, cdel = prev[j].cost,
                    cins = cur[j - 1].cost;
            /* tie-break order matches the python fallback: sub, del, ins */
            if (csub <= cdel && csub <= cins) {
                cur[j] = prev[j - 1]; cur[j].cost++; cur[j].sub++;
            } else if (cdel <= cins) {
                cur[j] = prev[j]; cur[j].cost++; cur[j].del++;
            } else {
                cur[j] = cur[j - 1]; cur[j].cost++; cur[j].ins++;
            }
        }
        cell *t = prev; prev = cur; cur = t;
    }
    out[0] = prev[n].cost; out[1] = prev[n].ins;
    out[2] = prev[n].del; out[3] = prev[n].sub;
    free(prev); free(cur);
    return 0;
}

/* Full alignment backtrace. ops buffer must hold at least m+n entries.
 * Writes operations as pairs (ai, bi) of indices into a/b, with -1
 * marking a gap. Returns the number of aligned pairs, or -1 on error. */
int align_i32(const int32_t *a, int64_t m, const int32_t *b, int64_t n,
              int32_t *ops_a, int32_t *ops_b) {
    int32_t *dp = malloc((size_t)(m + 1) * (size_t)(n + 1) * sizeof(int32_t));
    if (!dp) return -1;
#define DP(i, j) dp[(i) * (n + 1) + (j)]
    for (int64_t i = 0; i <= m; i++) DP(i, 0) = (int32_t)i;
    for (int64_t j = 0; j <= n; j++) DP(0, j) = (int32_t)j;
    for (int64_t i = 1; i <= m; i++) {
        int32_t ai = a[i - 1];
        for (int64_t j = 1; j <= n; j++) {
            int32_t c = DP(i - 1, j - 1) + (ai != b[j - 1]);
            int32_t d = DP(i - 1, j) + 1;
            int32_t e = DP(i, j - 1) + 1;
            if (d < c) c = d;
            if (e < c) c = e;
            DP(i, j) = c;
        }
    }
    int64_t i = m, j = n, k = 0;
    while (i > 0 || j > 0) {
        if (i > 0 && j > 0 &&
            DP(i, j) == DP(i - 1, j - 1) + (a[i - 1] != b[j - 1])) {
            ops_a[k] = (int32_t)(i - 1); ops_b[k] = (int32_t)(j - 1);
            i--; j--;
        } else if (i > 0 && DP(i, j) == DP(i - 1, j) + 1) {
            ops_a[k] = (int32_t)(i - 1); ops_b[k] = -1;
            i--;
        } else {
            ops_a[k] = -1; ops_b[k] = (int32_t)(j - 1);
            j--;
        }
        k++;
    }
    free(dp);
    /* reverse in place */
    for (int64_t l = 0; l < k / 2; l++) {
        int32_t t = ops_a[l]; ops_a[l] = ops_a[k - 1 - l]; ops_a[k - 1 - l] = t;
        t = ops_b[l]; ops_b[l] = ops_b[k - 1 - l]; ops_b[k - 1 - l] = t;
    }
#undef DP
    return (int)k;
}
