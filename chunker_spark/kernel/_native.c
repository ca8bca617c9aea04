/* Content-defined chunking kernel — native provider for kernel/native.py.
 *
 * Scalar statement of the exact scheme in kernel/chunker.py +
 * kernel/rabin.py (reference semantics: rabin.d rolling recurrence,
 * package.d:173-260 boundary policy): a 64-byte-window Rabin rolling
 * hash over a degree-53 GF(2) polynomial with the classic
 * out-table/mod-table formulation, per-chunk 0x01 marker, unhashed
 * pre-skip, 64-byte warm-up, check-before-slide boundary test,
 * force-cut at max_size, EOF rule.
 *
 * Two structural simplifications over the textbook ring-buffer form,
 * both exact (window starts all-zero and out_table[0] == 0):
 *   - warm-up slides evict only zero bytes, except the 64th data byte
 *     which evicts the 0x01 marker — so no window array is kept;
 *   - in the scan loop the evicted byte is simply data[pos - 64]
 *     (pos - 64 >= s + min_size - 64 = first hashed byte, always
 *     in-bounds because min_size >= 64 is validated Python-side).
 *
 * Built at import time by kernel/native_cc.py (`gcc -O3 -shared`);
 * equivalence with the scalar oracle is pinned by the golden vectors
 * and the Hypothesis suite in tests/test_native_kernel.py.
 */

#include <stdint.h>
#include <stddef.h>

#define WINDOW_SIZE 64

static int deg(uint64_t p) { return 63 - __builtin_clzll(p); }

/* polynomial remainder of x modulo p over GF(2) (polynomials.py mod) */
static uint64_t polymod(uint64_t x, uint64_t p) {
    int k = deg(p);
    while (x >> k) {
        x ^= p << (deg(x) - k);
    }
    return x;
}

typedef struct {
    uint64_t out_table[256]; /* fp of byte b followed by 63 zero bytes */
    uint64_t mod_table[256]; /* one-XOR reduction for top byte, tagged */
    int shift;               /* deg(pol) - 8 */
} tables_t;

static void fill_tables(uint64_t pol, tables_t *t) {
    int k = deg(pol);
    for (int b = 0; b < 256; b++) {
        uint64_t h = (uint64_t)b;
        for (int i = 0; i < WINDOW_SIZE - 1; i++) h = polymod(h << 8, pol);
        t->out_table[b] = h;
    }
    for (int b = 0; b < 256; b++) {
        uint64_t v = (uint64_t)b << k;
        t->mod_table[b] = polymod(v, pol) | v;
    }
    t->shift = k - 8;
}

/* Chunk one buffer; writes (offset, length, cut) triples, returns the
 * chunk count, or -1 if `cap` slots were not enough. */
static int64_t chunk_one(const uint8_t *data, int64_t n, const tables_t *t,
                         uint64_t mask, int64_t min_size, int64_t max_size,
                         int64_t *out_off, int64_t *out_len, uint64_t *out_cut,
                         int64_t cap) {
    const uint64_t *out_table = t->out_table;
    const uint64_t *mod_table = t->mod_table;
    const int shift = t->shift;
    const int64_t pre = min_size - WINDOW_SIZE;
    int64_t s = 0, cnt = 0;
    while (s < n) {
        if (cnt == cap) return -1;
        int64_t rem = n - s;
        /* 0x01 marker slide: digest 0, evicts 0 -> digest becomes 1 */
        uint64_t dg = ((uint64_t)1) ^ mod_table[0];
        int64_t w0 = pre < rem ? s + pre : n;
        int64_t warm_end = min_size < rem ? s + min_size : n;
        for (int64_t i = w0; i < warm_end; i++) {
            uint64_t d = dg ^ (i - w0 == WINDOW_SIZE - 1 ? out_table[1] : 0);
            dg = ((d << 8) | data[i]) ^ mod_table[d >> shift];
        }
        int64_t limit = max_size < rem ? s + max_size : n;
        int64_t pos = warm_end;
        while (pos < limit && (dg & mask) != 0) {
            uint64_t d = dg ^ out_table[data[pos - WINDOW_SIZE]];
            dg = ((d << 8) | data[pos]) ^ mod_table[d >> shift];
            pos++;
        }
        out_off[cnt] = s;
        out_len[cnt] = pos - s;
        out_cut[cnt] = dg;
        cnt++;
        s = pos;
    }
    return cnt;
}

/* Entry point (ctypes). Outputs are flat arrays sized `cap` by the
 * caller; counts[i] = chunks of buffer i. Returns total chunks,
 * -1 on capacity overflow, -2 on invalid params. */
int64_t cdc_chunk_many(const uint8_t **bufs, const int64_t *lens,
                       int64_t nbufs, uint64_t pol, int average_bits,
                       int64_t min_size, int64_t max_size,
                       int64_t *out_off, int64_t *out_len, uint64_t *out_cut,
                       int64_t *counts, int64_t cap) {
    if (pol == 0 || min_size < WINDOW_SIZE || max_size < min_size ||
        average_bits < 1 || average_bits > 63)
        return -2;
    tables_t t;
    fill_tables(pol, &t);
    const uint64_t mask = (((uint64_t)1) << average_bits) - 1;
    int64_t total = 0;
    for (int64_t i = 0; i < nbufs; i++) {
        int64_t c = chunk_one(bufs[i], lens[i], &t, mask, min_size, max_size,
                              out_off + total, out_len + total,
                              out_cut + total, cap - total);
        if (c < 0) return -1;
        counts[i] = c;
        total += c;
    }
    return total;
}
