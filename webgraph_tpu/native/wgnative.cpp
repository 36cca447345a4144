// Host-side native runtime: fast scalar BVGraph bit-stream machinery.
//
// The TPU compute path is JAX/XLA/Pallas (webgraph_tpu.ops); this library is
// the *host* substrate mirroring the role the reference's external Java
// libraries play (dsiutils bit streams, SURVEY §2.10): offsets-index decode,
// outdegree scans, and a full sequential BVGraph decoder used as the fast
// oracle for golden tests and for staging big graphs.  MSB-first bit
// discipline identical to webgraph_tpu.ops.bitio (golden-tested against the
// cnr-2000 fixture).
//
// Build: make (g++ -O3 -shared).  Python binding: ctypes (native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t len;       // bytes
    size_t pos;       // bit position

    // NOTE: callers must pad `data` with >= 16 readable zero bytes past
    // `len` (the ctypes binding does) so unaligned 64-bit loads are safe.
    explicit BitReader(const uint8_t* d, size_t l) : data(d), len(l), pos(0) {}

    inline uint64_t load64(size_t byte) const {
        uint64_t w;
        std::memcpy(&w, data + byte, 8);
        return __builtin_bswap64(w);
    }

    inline uint64_t read_bits(int n) {
        if (n == 0) return 0;
        size_t byte = pos >> 3;
        int o = pos & 7;
        unsigned __int128 acc =
            ((unsigned __int128)load64(byte) << 64) | load64(byte + 8);
        pos += n;
        return (uint64_t)(acc >> (128 - o - n))
               & ((n == 64) ? ~(uint64_t)0 : (((uint64_t)1 << n) - 1));
    }

    inline int64_t read_unary() {
        int64_t count = 0;
        size_t byte = pos >> 3;
        int o = pos & 7;
        uint64_t w = load64(byte) << o;
        if (w) {
            int z = __builtin_clzll(w);
            pos += z + 1;
            return z;
        }
        count = 64 - o;
        pos += count;
        for (;;) {
            if ((pos >> 3) >= len + 16) return count;  // corrupt stream guard
            w = load64(pos >> 3) << (pos & 7);
            if (w) {
                int z = __builtin_clzll(w);
                pos += z + 1;
                return count + z;
            }
            int adv = 64 - (int)(pos & 7);
            count += adv;
            pos += adv;
        }
    }

    inline int64_t read_gamma() {
        int64_t u = read_unary();
        if (u == 0) return 0;
        return (int64_t)(((uint64_t)1 << u) | read_bits((int)u)) - 1;
    }

    inline int64_t read_delta() {
        int64_t b = read_gamma();
        if (b == 0) return 0;
        return (int64_t)(((uint64_t)1 << b) | read_bits((int)b)) - 1;
    }

    inline int64_t read_zeta(int k) {
        int64_t h = read_unary();
        int64_t left = (int64_t)1 << (h * k);
        int64_t m = (int64_t)read_bits((int)(h * k + k - 1));
        if (m < left) return m + left - 1;
        return (m << 1) + (int64_t)read_bits(1) - 1;
    }

    inline int64_t read_minimal_binary(int64_t b) {
        int s = 63 - __builtin_clzll((uint64_t)b);
        int64_t mshort = ((int64_t)1 << (s + 1)) - b;
        int64_t v = (int64_t)read_bits(s);
        if (v < mshort) return v;
        return (v << 1) + (int64_t)read_bits(1) - mshort;
    }

    inline int64_t read_golomb(int64_t b) {
        if (b == 0) return 0;
        int64_t q = read_unary();
        return q * b + read_minimal_binary(b);
    }

    inline int64_t read_nibble() {
        int64_t acc = 0;
        for (;;) {
            uint64_t nib = read_bits(4);
            acc = (acc << 3) | (int64_t)(nib & 7);
            if (nib & 8) return acc;
        }
    }
};

inline int64_t nat2int(int64_t z) { return (int64_t)((uint64_t)z >> 1) ^ -(z & 1); }

constexpr int K_DELTA = 1, K_GAMMA = 2, K_GOLOMB = 3, K_UNARY = 5,
              K_ZETA = 6, K_NIBBLE = 7;

inline int64_t read_coded(BitReader& r, int coding, int zeta_k) {
    switch (coding) {
        case K_GAMMA: return r.read_gamma();
        case K_DELTA: return r.read_delta();
        case K_UNARY: return r.read_unary();
        case K_ZETA: return r.read_zeta(zeta_k);
        case K_GOLOMB: return r.read_golomb(zeta_k);
        case K_NIBBLE: return r.read_nibble();
        default: return -1;
    }
}

}  // namespace

extern "C" {

// Decode an (n+1)-entry gap stream (gamma or delta) into absolute offsets.
// Returns 0 on success.
int wg_decode_offset_stream(const uint8_t* data, int64_t len_bytes,
                            int64_t n_plus_1, int coding, int64_t* out) {
    BitReader r(data, (size_t)len_bytes);
    int64_t acc = 0;
    for (int64_t i = 0; i < n_plus_1; i++) {
        acc += (coding == K_DELTA) ? r.read_delta() : r.read_gamma();
        out[i] = acc;
    }
    return 0;
}

// Decode all outdegrees given per-node bit offsets.
int wg_decode_outdegrees(const uint8_t* data, int64_t len_bytes,
                         const int64_t* offsets, int64_t n, int coding,
                         int64_t* out) {
    BitReader r(data, (size_t)len_bytes);
    for (int64_t x = 0; x < n; x++) {
        r.pos = (size_t)offsets[x];
        out[x] = (coding == K_DELTA) ? r.read_delta() : r.read_gamma();
    }
    return 0;
}

// Full sequential BVGraph decode into CSR arrays.
// codings: [outdegree, reference, block_count, block, residual]
// csr_off must hold n+1 entries (filled); succ must hold >= m entries where
// m = sum of outdegrees (caller obtains it via wg_decode_outdegrees).
// Returns the number of arcs written, or -1 on error.
int64_t wg_bv_decode_all(const uint8_t* data, int64_t len_bytes, int64_t n,
                         int window_size, int min_interval_length, int zeta_k,
                         const int* codings, int64_t* csr_off, int64_t* succ,
                         int64_t succ_capacity) {
    const int c_out = codings[0], c_ref = codings[1], c_bcnt = codings[2],
              c_blk = codings[3], c_res = codings[4];
    BitReader r(data, (size_t)len_bytes);
    const int cyclic = window_size + 1;
    std::vector<std::vector<int64_t>> window((size_t)cyclic);
    std::vector<int64_t> blocks, buf, extras;
    int64_t wp = 0;
    csr_off[0] = 0;
    for (int64_t x = 0; x < n; x++) {
        int64_t d = read_coded(r, c_out, zeta_k);
        std::vector<int64_t>& mine = window[(size_t)(x % cyclic)];
        mine.clear();
        if (d < 0) return -1;
        if (d > 0) {
            int64_t ref = -1;
            if (window_size > 0) ref = read_coded(r, c_ref, zeta_k);
            int64_t copied = 0;
            blocks.clear();
            if (ref > 0) {
                const std::vector<int64_t>& rl =
                    window[(size_t)(((x - ref) % cyclic + cyclic) % cyclic)];
                int64_t bcnt = read_coded(r, c_bcnt, zeta_k);
                int64_t total = 0;
                for (int64_t i = 0; i < bcnt; i++) {
                    int64_t b = read_coded(r, c_blk, zeta_k) + (i ? 1 : 0);
                    blocks.push_back(b);
                    total += b;
                    if (i % 2 == 0) copied += b;
                }
                if (bcnt % 2 == 0) copied += (int64_t)rl.size() - total;
                // apply mask
                buf.clear();
                size_t p = 0;
                bool keep = true;
                for (size_t bi = 0; bi < blocks.size(); bi++) {
                    size_t cnt = (size_t)blocks[bi];
                    if (keep)
                        for (size_t j = 0; j < cnt && p + j < rl.size(); j++)
                            buf.push_back(rl[p + j]);
                    p += cnt;
                    keep = !keep;
                }
                if (blocks.size() % 2 == 0)
                    for (size_t j = p; j < rl.size(); j++) buf.push_back(rl[j]);
            } else {
                buf.clear();
            }
            int64_t extra = d - copied;
            extras.clear();
            if (extra > 0) {
                if (min_interval_length != 0) {
                    int64_t icnt = r.read_gamma();
                    int64_t prev = 0;
                    for (int64_t i = 0; i < icnt; i++) {
                        int64_t left;
                        if (i == 0)
                            left = prev = nat2int(r.read_gamma()) + x;
                        else
                            left = prev = r.read_gamma() + prev + 1;
                        int64_t ln = r.read_gamma() + min_interval_length;
                        for (int64_t j = 0; j < ln; j++) extras.push_back(left + j);
                        prev += ln;
                        extra -= ln;
                    }
                }
                if (extra > 0) {
                    int64_t prev = x + nat2int(read_coded(r, c_res, zeta_k));
                    extras.push_back(prev);
                    for (int64_t i = 1; i < extra; i++) {
                        prev += read_coded(r, c_res, zeta_k) + 1;
                        extras.push_back(prev);
                    }
                }
            }
            // merge buf (sorted) and extras (two sorted runs) into mine
            mine.reserve((size_t)d);
            mine.insert(mine.end(), buf.begin(), buf.end());
            mine.insert(mine.end(), extras.begin(), extras.end());
            std::sort(mine.begin(), mine.end());
            if ((int64_t)mine.size() != d) return -2;
            if (wp + d > succ_capacity) return -3;
            std::memcpy(succ + wp, mine.data(), (size_t)d * sizeof(int64_t));
            wp += d;
        }
        csr_off[x + 1] = wp;
    }
    return wp;
}

}  // extern "C"
