// BooPHF serialization-interop harness (VERDICT r3 Missing #4).
//
// Builds the reference's boomphf::mphf (the exact type gatb-core's
// MPHFAlgorithm persists into /dsk/mphf: BooPHF.hpp:230-340 hasher_t
// over jenkins64 seeded with mt19937_64(37)) over u64 keys read from
// stdin-given file, then
//   save <keys.u64> <out.bin>           : build + serialize
//   lookup <keys.u64> <mphf.bin> <q.u64>: load + print lookups
// for byte-level and query-level comparison against
// gatb_core_tpu/collections/boophf_ref.py.
//
// Build: c++ -std=c++11 -O2 -I/root/reference/gatb-core/thirdparty \
//   -I/root/reference/gatb-core/src tools_dev/ref_boophf_harness.cpp \
//   -o /tmp/ref_boophf -lpthread
#include <cstdio>
#include <cstdint>
#include <vector>
#include <fstream>
#include <random>
#include <tuple>
#include <cstring>
#include <sys/types.h>
typedef u_int8_t u8_compat;
#include <BooPHF/BooPHF.h>

// replicate gatb's hasher_t (BooPHF.hpp:236-258) for Key = uint64_t
typedef std::pair<const uint8_t*, const uint8_t*> byte_range_t;
static inline uint64_t unaligned_load64(uint8_t const* from)
{ uint64_t t; memcpy(&t, from, 8); return t; }
struct jenkins64_hasher {
    uint64_t m_seed;
    typedef std::tuple<uint64_t,uint64_t,uint64_t> hash_triple_t;
    static void mix(hash_triple_t &h) {
        uint64_t &a = std::get<0>(h), &b = std::get<1>(h), &c = std::get<2>(h);
        a -= b; a -= c; a ^= (c >> 43);
        b -= c; b -= a; b ^= (a << 9);
        c -= a; c -= b; c ^= (b >> 8);
        a -= b; a -= c; a ^= (c >> 38);
        b -= c; b -= a; b ^= (a << 23);
        c -= a; c -= b; c ^= (b >> 5);
        a -= b; a -= c; a ^= (c >> 35);
        b -= c; b -= a; b ^= (a << 49);
        c -= a; c -= b; c ^= (b >> 11);
        a -= b; a -= c; a ^= (c >> 12);
        b -= c; b -= a; b ^= (a << 18);
        c -= a; c -= b; c ^= (b >> 22);
    }
    hash_triple_t operator()(byte_range_t s) const {
        hash_triple_t h(m_seed, m_seed, 0x9e3779b97f4a7c13ULL);
        size_t len = (size_t)(s.second - s.first);
        uint8_t const* cur = s.first;
        uint8_t const* end = s.second;
        while (end - cur >= 24) {
            std::get<0>(h) += unaligned_load64(cur); cur += 8;
            std::get<1>(h) += unaligned_load64(cur); cur += 8;
            std::get<2>(h) += unaligned_load64(cur); cur += 8;
            mix(h);
        }
        std::get<2>(h) += len;
        switch (end - cur) {
            case 16: std::get<1>(h) += (uint64_t(cur[15]) << 56);
            case 15: std::get<1>(h) += (uint64_t(cur[14]) << 48);
            case 14: std::get<1>(h) += (uint64_t(cur[13]) << 40);
            case 13: std::get<1>(h) += (uint64_t(cur[12]) << 32);
            case 12: std::get<1>(h) += (uint64_t(cur[11]) << 24);
            case 11: std::get<1>(h) += (uint64_t(cur[10]) << 16);
            case 10: std::get<1>(h) += (uint64_t(cur[ 9]) << 8);
            case  9: std::get<1>(h) += (uint64_t(cur[ 8]));
            case  8: std::get<0>(h) += (uint64_t(cur[ 7]) << 56);
            case  7: std::get<0>(h) += (uint64_t(cur[ 6]) << 48);
            case  6: std::get<0>(h) += (uint64_t(cur[ 5]) << 40);
            case  5: std::get<0>(h) += (uint64_t(cur[ 4]) << 32);
            case  4: std::get<0>(h) += (uint64_t(cur[ 3]) << 24);
            case  3: std::get<0>(h) += (uint64_t(cur[ 2]) << 16);
            case  2: std::get<0>(h) += (uint64_t(cur[ 1]) << 8);
            case  1: std::get<0>(h) += (uint64_t(cur[ 0]));
            case  0: break;
        }
        mix(h);
        return h;
    }
};
struct hasher_t {
    jenkins64_hasher emphf_hasher;
    hasher_t() { std::mt19937_64 rng(37); emphf_hasher.m_seed = rng(); }
    uint64_t operator()(const uint64_t &key, uint64_t seed = 0) const {
        byte_range_t r((const uint8_t*)&key, (const uint8_t*)&key + 8);
        if (seed != 0x33333333CCCCCCCCULL)
            return std::get<0>(emphf_hasher(r));
        return std::get<2>(emphf_hasher(r));
    }
};
typedef boomphf::mphf<uint64_t, hasher_t> boophf_t;

// 16-byte key (the k>32 LargeInt<2> layout: low word first)
struct K2 { uint64_t lo, hi;
    bool operator==(const K2 &o) const { return lo == o.lo && hi == o.hi; }
};
namespace std { template<> struct hash<K2> {
    size_t operator()(const K2 &k) const {
        return hash<uint64_t>()(k.lo) ^ (hash<uint64_t>()(k.hi) << 1); }
}; }
struct hasher2_t {
    jenkins64_hasher emphf_hasher;
    hasher2_t() { std::mt19937_64 rng(37); emphf_hasher.m_seed = rng(); }
    uint64_t operator()(const K2 &key, uint64_t seed = 0) const {
        byte_range_t r((const uint8_t*)&key, (const uint8_t*)&key + 16);
        if (seed != 0x33333333CCCCCCCCULL)
            return std::get<0>(emphf_hasher(r));
        return std::get<2>(emphf_hasher(r));
    }
};
typedef boomphf::mphf<K2, hasher2_t> boophf2_t;

static std::vector<uint64_t> read_u64(const char* path) {
    std::ifstream f(path, std::ios::binary);
    f.seekg(0, std::ios::end); size_t n = (size_t)f.tellg() / 8;
    f.seekg(0); std::vector<uint64_t> v(n);
    f.read((char*)v.data(), n * 8); return v;
}

static std::vector<K2> read_k2(const char* path) {
    std::ifstream f(path, std::ios::binary);
    f.seekg(0, std::ios::end); size_t n = (size_t)f.tellg() / 16;
    f.seekg(0); std::vector<K2> v(n);
    f.read((char*)v.data(), n * 16); return v;
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: save|lookup|save2|lookup2\n"); return 1; }
    if (!strcmp(argv[1], "save")) {
        auto keys = read_u64(argv[2]);
        boophf_t bphf(keys.size(), keys, 1, 3.0, false);
        std::ofstream os(argv[3], std::ios::binary);
        bphf.save(os);
    } else if (!strcmp(argv[1], "save2")) {
        auto keys = read_k2(argv[2]);
        boophf2_t bphf(keys.size(), keys, 1, 3.0, false);
        std::ofstream os(argv[3], std::ios::binary);
        bphf.save(os);
    } else if (!strcmp(argv[1], "lookup2")) {
        boophf2_t bphf;
        std::ifstream is(argv[3], std::ios::binary);
        bphf.load(is);
        auto q = read_k2(argv[2]);
        for (auto k : q) printf("%llu\n", (unsigned long long)bphf.lookup(k));
    } else {
        boophf_t bphf;
        std::ifstream is(argv[3], std::ios::binary);
        bphf.load(is);
        auto q = read_u64(argv[2]);
        for (auto k : q) printf("%llu\n", (unsigned long long)bphf.lookup(k));
    }
    return 0;
}
