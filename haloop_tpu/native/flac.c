/* Native FLAC decoder for the data layer.
 *
 * The reference loads FLAC (LibriSpeech's format) through torchaudio's
 * C++ backends (ha/data.py:56-63); this image ships no audio library,
 * so the TPU-native data loader decodes FLAC itself. Implemented from
 * the public format specification (RFC 9639): STREAMINFO, frame
 * headers, constant/verbatim/fixed/LPC subframes, 4/5-bit Rice
 * residual partitions with escapes, wasted bits, and
 * left-side/right-side/mid-side stereo decorrelation. CRCs are parsed
 * but not verified (value-level round-trip is tested instead).
 *
 * Exported:
 *   flac_streaminfo(data, size, &channels, &rate, &bps, &total) -> 0/-1
 *   flac_decode(data, size, out, capacity_frames, &channels, &rate,
 *               &bps) -> frames decoded (interleaved int32), or < 0
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const uint8_t *data;
    long long nbytes;
    long long bytepos;
    uint64_t cache;   /* left-aligned pending bits */
    int ncached;
    int error;
} BR;

static void br_init(BR *br, const uint8_t *data, long long nbytes) {
    br->data = data;
    br->nbytes = nbytes;
    br->bytepos = 0;
    br->cache = 0;
    br->ncached = 0;
    br->error = 0;
}

static void br_fill(BR *br) {
    while (br->ncached <= 56 && br->bytepos < br->nbytes) {
        br->cache |= (uint64_t)br->data[br->bytepos++] << (56 - br->ncached);
        br->ncached += 8;
    }
}

static uint32_t br_read(BR *br, int n) { /* 0 <= n <= 32 */
    uint32_t v;
    if (n == 0) return 0;
    br_fill(br);
    if (br->ncached < n) { br->error = 1; return 0; }
    v = (uint32_t)(br->cache >> (64 - n));
    br->cache <<= n;
    br->ncached -= n;
    return v;
}

static int32_t br_read_signed(BR *br, int n) {
    uint32_t v = br_read(br, n);
    if (n > 0 && n < 32 && (v >> (n - 1)))
        v |= ~((((uint32_t)1) << n) - 1);
    return (int32_t)v;
}

static int br_unary(BR *br) { /* count 0s, consume terminating 1 */
    int count = 0;
    for (;;) {
        int lz;
        br_fill(br);
        if (br->ncached == 0) { br->error = 1; return 0; }
        if (br->cache == 0) {
            count += br->ncached;
            br->ncached = 0;
            continue;
        }
        lz = __builtin_clzll(br->cache);
        if (lz >= br->ncached) {
            count += br->ncached;
            br->cache = 0;
            br->ncached = 0;
            continue;
        }
        count += lz;
        br->cache <<= (lz + 1);
        br->ncached -= (lz + 1);
        return count;
    }
}

static void br_align(BR *br) {
    br_read(br, br->ncached & 7);
}

static long long br_remaining_bits(const BR *br) {
    return (br->nbytes - br->bytepos) * 8 + br->ncached;
}

/* ---------------------------------------------------------- metadata */

typedef struct {
    int channels, rate, bps;
    int max_blocksize;
    long long total;
} StreamInfo;

static int parse_streaminfo(const uint8_t *data, long long size,
                            StreamInfo *si) {
    BR br;
    int last, type;
    long long len;
    if (size < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
    br_init(&br, data + 4, size - 4);
    for (;;) {
        last = br_read(&br, 1);
        type = br_read(&br, 7);
        len = br_read(&br, 24);
        if (br.error) return -1;
        if (type == 0) { /* STREAMINFO */
            br_read(&br, 16);               /* min blocksize */
            si->max_blocksize = br_read(&br, 16);
            br_read(&br, 24);               /* min framesize */
            br_read(&br, 24);               /* max framesize */
            si->rate = br_read(&br, 20);
            si->channels = br_read(&br, 3) + 1;
            si->bps = br_read(&br, 5) + 1;
            si->total = ((long long)br_read(&br, 4) << 32);
            si->total |= br_read(&br, 32);
            { int i; for (i = 0; i < 16; i++) br_read(&br, 8); /* MD5 */ }
            return br.error ? -1 : 0;
        }
        { long long i; for (i = 0; i < len; i++) br_read(&br, 8); }
        if (br.error) return -1;
        if (last) return -1; /* no STREAMINFO found */
    }
}

/* skip remaining metadata blocks; returns byte offset of first frame */
static long long first_frame_offset(const uint8_t *data, long long size) {
    long long pos = 4;
    for (;;) {
        int last;
        long long len;
        if (pos + 4 > size) return -1;
        last = data[pos] >> 7;
        len = ((long long)data[pos + 1] << 16) |
              ((long long)data[pos + 2] << 8) | data[pos + 3];
        pos += 4 + len;
        if (pos > size) return -1;
        if (last) return pos;
    }
}

/* ------------------------------------------------------------ frames */

static void skip_utf8_number(BR *br) {
    uint32_t b = br_read(br, 8);
    int extra = 0;
    while (b & 0x80) { extra++; b <<= 1; b &= 0xff; }
    if (extra) extra -= 1;
    while (extra-- > 0) br_read(br, 8);
}

static int decode_residual(BR *br, int32_t *out, int blocksize, int order) {
    int method = br_read(br, 2);
    int pbits, escape, porder, nparts, psize, part, idx;
    if (method > 1) return -1;
    pbits = method ? 5 : 4;
    escape = method ? 31 : 15;
    porder = br_read(br, 4);
    nparts = 1 << porder;
    psize = blocksize >> porder;
    if (psize <= 0 || (psize << porder) != blocksize) return -1;
    idx = order;
    for (part = 0; part < nparts; part++) {
        int count = psize - (part == 0 ? order : 0);
        int param = br_read(br, pbits);
        int i;
        if (count < 0) return -1;
        if (param == escape) {
            int raw = br_read(br, 5);
            for (i = 0; i < count; i++)
                out[idx++] = raw ? br_read_signed(br, raw) : 0;
        } else {
            for (i = 0; i < count; i++) {
                uint32_t q = (uint32_t)br_unary(br);
                uint32_t u = (q << param) | br_read(br, param);
                out[idx++] = (int32_t)(u >> 1) ^ -(int32_t)(u & 1);
            }
        }
        if (br->error) return -1;
    }
    return 0;
}

static void restore_fixed(int32_t *s, int blocksize, int order) {
    int i;
    switch (order) {
    case 0: break;
    case 1:
        for (i = order; i < blocksize; i++)
            s[i] += s[i - 1];
        break;
    case 2:
        for (i = order; i < blocksize; i++)
            s[i] += 2 * s[i - 1] - s[i - 2];
        break;
    case 3:
        for (i = order; i < blocksize; i++)
            s[i] += 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3];
        break;
    case 4:
        for (i = order; i < blocksize; i++)
            s[i] += 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4];
        break;
    }
}

static int decode_subframe(BR *br, int32_t *out, int blocksize, int bps) {
    int type, wasted = 0, i;
    if (br_read(br, 1) != 0) return -1;    /* mandatory zero pad */
    type = br_read(br, 6);
    if (br_read(br, 1))
        wasted = br_unary(br) + 1;
    bps -= wasted;
    if (bps <= 0 || bps > 32) return -1;

    if (type == 0) {                        /* CONSTANT */
        int32_t v = br_read_signed(br, bps);
        for (i = 0; i < blocksize; i++) out[i] = v;
    } else if (type == 1) {                 /* VERBATIM */
        for (i = 0; i < blocksize; i++) out[i] = br_read_signed(br, bps);
    } else if (type >= 8 && type <= 12) {   /* FIXED order 0..4 */
        int order = type - 8;
        if (order > blocksize) return -1;
        for (i = 0; i < order; i++) out[i] = br_read_signed(br, bps);
        if (decode_residual(br, out, blocksize, order)) return -1;
        restore_fixed(out, blocksize, order);
    } else if (type >= 32) {                /* LPC order 1..32 */
        int order = (type & 31) + 1;
        int precision, shift, j;
        int32_t coef[32];
        if (order > blocksize) return -1;
        for (i = 0; i < order; i++) out[i] = br_read_signed(br, bps);
        precision = br_read(br, 4) + 1;
        if (precision > 15) return -1;  /* raw 0b1111 is invalid (RFC 9639) */
        shift = br_read_signed(br, 5);
        if (shift < 0) return -1;
        for (j = 0; j < order; j++) coef[j] = br_read_signed(br, precision);
        if (decode_residual(br, out, blocksize, order)) return -1;
        for (i = order; i < blocksize; i++) {
            int64_t acc = 0;
            for (j = 0; j < order; j++)
                acc += (int64_t)coef[j] * out[i - 1 - j];
            out[i] += (int32_t)(acc >> shift);
        }
    } else {
        return -1;
    }
    if (br->error) return -1;
    if (wasted)
        for (i = 0; i < blocksize; i++) out[i] <<= wasted;
    return 0;
}

static const int BLOCKSIZE_TABLE[16] = {
    0, 192, 576, 1152, 2304, 4608, -1, -2,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

long long flac_decode(const uint8_t *data, long long size, int32_t *out,
                      long long capacity, int *channels, int *rate,
                      int *bps) {
    StreamInfo si;
    BR br;
    long long frame0, decoded = 0;
    int32_t *buf;
    int maxbs;

    if (parse_streaminfo(data, size, &si)) return -2;
    frame0 = first_frame_offset(data, size);
    if (frame0 < 0) return -3;
    *channels = si.channels;
    *rate = si.rate;
    *bps = si.bps;
    maxbs = si.max_blocksize > 0 ? si.max_blocksize : 65535;

    buf = (int32_t *)malloc((size_t)maxbs * si.channels * sizeof(int32_t));
    if (!buf) return -4;

    br_init(&br, data + frame0, size - frame0);
    while (br_remaining_bits(&br) >= 40 && decoded < capacity) {
        int bs_code, sr_code, chan_asgn, ss_code, nch, blocksize, bits;
        int ch, i;
        if (br_read(&br, 14) != 0x3ffe) break;   /* lost sync / end */
        br_read(&br, 1);                          /* reserved */
        br_read(&br, 1);                          /* blocking strategy */
        bs_code = br_read(&br, 4);
        sr_code = br_read(&br, 4);
        chan_asgn = br_read(&br, 4);
        ss_code = br_read(&br, 3);
        br_read(&br, 1);                          /* reserved */
        skip_utf8_number(&br);
        if (bs_code == 0) goto fail;
        blocksize = BLOCKSIZE_TABLE[bs_code];
        if (blocksize == -1) blocksize = br_read(&br, 8) + 1;
        else if (blocksize == -2) blocksize = br_read(&br, 16) + 1;
        if (sr_code == 12) br_read(&br, 8);
        else if (sr_code == 13 || sr_code == 14) br_read(&br, 16);
        else if (sr_code == 15) goto fail;
        br_read(&br, 8);                          /* header CRC-8 */
        if (br.error || blocksize > maxbs) goto fail;

        switch (ss_code) {
        case 0: bits = si.bps; break;
        case 1: bits = 8; break;
        case 2: bits = 12; break;
        case 4: bits = 16; break;
        case 5: bits = 20; break;
        case 6: bits = 24; break;
        case 7: bits = 32; break;
        default: goto fail;
        }

        if (chan_asgn > 10) goto fail;  /* 11-15 reserved (RFC 9639) */
        nch = chan_asgn < 8 ? chan_asgn + 1 : 2;
        if (nch != si.channels) goto fail;
        for (ch = 0; ch < nch; ch++) {
            int chbits = bits;
            if ((chan_asgn == 8 && ch == 1) ||
                (chan_asgn == 9 && ch == 0) ||
                (chan_asgn == 10 && ch == 1))
                chbits += 1;                      /* side channel */
            if (decode_subframe(&br, buf + (long long)ch * maxbs,
                                blocksize, chbits))
                goto fail;
        }
        br_align(&br);
        br_read(&br, 16);                         /* frame CRC-16 */
        if (br.error) goto fail;

        if (chan_asgn == 8) {                     /* left/side */
            for (i = 0; i < blocksize; i++)
                buf[maxbs + i] = buf[i] - buf[maxbs + i];
        } else if (chan_asgn == 9) {              /* right/side */
            for (i = 0; i < blocksize; i++)
                buf[i] = buf[maxbs + i] + buf[i];
        } else if (chan_asgn == 10) {             /* mid/side */
            for (i = 0; i < blocksize; i++) {
                int64_t mid = ((int64_t)buf[i]) << 1;
                int32_t side = buf[maxbs + i];
                mid |= (side & 1);
                buf[i] = (int32_t)((mid + side) >> 1);
                buf[maxbs + i] = (int32_t)((mid - side) >> 1);
            }
        }

        for (i = 0; i < blocksize && decoded < capacity; i++, decoded++)
            for (ch = 0; ch < nch; ch++)
                out[decoded * nch + ch] = buf[(long long)ch * maxbs + i];
    }
    free(buf);
    return decoded;
fail:
    free(buf);
    return decoded > 0 ? decoded : -5;
}

int flac_streaminfo(const uint8_t *data, long long size, int *channels,
                    int *rate, int *bps, long long *total) {
    StreamInfo si;
    if (parse_streaminfo(data, size, &si)) return -1;
    *channels = si.channels;
    *rate = si.rate;
    *bps = si.bps;
    *total = si.total;
    return 0;
}
