// gidmap.cpp — native open-addressing hash map for the gid directory.
//
// The reference keeps gid -> (segId, vecId) and its inverse as FDB key ranges
// (fdb/FdbVectorStore.java:575-601); the one native component in its stack is
// the FDB C client. Here the gid directory is process-local and hot (every
// insert/delete/result-join touches it), and CPython dicts cost ~100B+/entry
// and GIL-bound per-op loops. This table stores int64 -> int64 with linear
// probing, power-of-two capacity, tombstone deletion, and batch operations
// that take raw pointers so numpy arrays pass through without per-element
// Python overhead.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -shared -fPIC -o libgidmap.so gidmap.cpp

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int64_t EMPTY = -1;      // never a valid gid
constexpr int64_t TOMBSTONE = -2;  // deleted slot

struct GidMap {
    int64_t* keys;
    int64_t* vals;
    uint64_t cap;    // power of two
    uint64_t size;   // live entries
    uint64_t used;   // live + tombstones (controls rehash)
};

inline uint64_t hash_key(int64_t k) {
    // splitmix64 finalizer — strong enough for sequential gids
    uint64_t x = static_cast<uint64_t>(k);
    x ^= x >> 30;
    x *= 0xbf58476d1ce4e5b9ULL;
    x ^= x >> 27;
    x *= 0x94d049bb133111ebULL;
    x ^= x >> 31;
    return x;
}

void init_table(GidMap* m, uint64_t cap) {
    m->cap = cap;
    m->size = 0;
    m->used = 0;
    m->keys = static_cast<int64_t*>(malloc(cap * sizeof(int64_t)));
    m->vals = static_cast<int64_t*>(malloc(cap * sizeof(int64_t)));
    for (uint64_t i = 0; i < cap; i++) m->keys[i] = EMPTY;
}

void rehash(GidMap* m, uint64_t new_cap);

inline void put_one(GidMap* m, int64_t key, int64_t val) {
    if ((m->used + 1) * 10 >= m->cap * 7) {  // load factor 0.7 incl tombstones
        uint64_t new_cap = m->cap;
        if ((m->size + 1) * 10 >= m->cap * 5) new_cap = m->cap * 2;
        rehash(m, new_cap);
    }
    uint64_t mask = m->cap - 1;
    uint64_t i = hash_key(key) & mask;
    int64_t first_tomb = -1;
    for (;;) {
        int64_t k = m->keys[i];
        if (k == key) {
            m->vals[i] = val;
            return;
        }
        if (k == TOMBSTONE && first_tomb < 0) first_tomb = static_cast<int64_t>(i);
        if (k == EMPTY) {
            if (first_tomb >= 0) {
                i = static_cast<uint64_t>(first_tomb);
            } else {
                m->used++;
            }
            m->keys[i] = key;
            m->vals[i] = val;
            m->size++;
            return;
        }
        i = (i + 1) & mask;
    }
}

void rehash(GidMap* m, uint64_t new_cap) {
    int64_t* old_keys = m->keys;
    int64_t* old_vals = m->vals;
    uint64_t old_cap = m->cap;
    init_table(m, new_cap);
    for (uint64_t i = 0; i < old_cap; i++) {
        if (old_keys[i] >= 0) put_one(m, old_keys[i], old_vals[i]);
    }
    free(old_keys);
    free(old_vals);
}

inline int64_t get_one(const GidMap* m, int64_t key) {
    uint64_t mask = m->cap - 1;
    uint64_t i = hash_key(key) & mask;
    for (;;) {
        int64_t k = m->keys[i];
        if (k == key) return m->vals[i];
        if (k == EMPTY) return -1;
        i = (i + 1) & mask;
    }
}

inline int remove_one(GidMap* m, int64_t key) {
    uint64_t mask = m->cap - 1;
    uint64_t i = hash_key(key) & mask;
    for (;;) {
        int64_t k = m->keys[i];
        if (k == key) {
            m->keys[i] = TOMBSTONE;
            m->size--;
            return 1;
        }
        if (k == EMPTY) return 0;
        i = (i + 1) & mask;
    }
}

}  // namespace

extern "C" {

void* gidmap_create(uint64_t initial_cap) {
    uint64_t cap = 64;
    while (cap < initial_cap * 2) cap <<= 1;
    GidMap* m = new GidMap();
    init_table(m, cap);
    return m;
}

void gidmap_destroy(void* h) {
    GidMap* m = static_cast<GidMap*>(h);
    free(m->keys);
    free(m->vals);
    delete m;
}

uint64_t gidmap_size(void* h) { return static_cast<GidMap*>(h)->size; }

void gidmap_put(void* h, int64_t key, int64_t val) {
    put_one(static_cast<GidMap*>(h), key, val);
}

int64_t gidmap_get(void* h, int64_t key) {
    return get_one(static_cast<GidMap*>(h), key);
}

int gidmap_remove(void* h, int64_t key) {
    return remove_one(static_cast<GidMap*>(h), key);
}

void gidmap_put_batch(void* h, const int64_t* keys, const int64_t* vals,
                      uint64_t n) {
    GidMap* m = static_cast<GidMap*>(h);
    for (uint64_t i = 0; i < n; i++) put_one(m, keys[i], vals[i]);
}

void gidmap_get_batch(void* h, const int64_t* keys, int64_t* out, uint64_t n) {
    GidMap* m = static_cast<GidMap*>(h);
    for (uint64_t i = 0; i < n; i++) out[i] = get_one(m, keys[i]);
}

void gidmap_remove_batch(void* h, const int64_t* keys, uint64_t n) {
    GidMap* m = static_cast<GidMap*>(h);
    for (uint64_t i = 0; i < n; i++) remove_one(m, keys[i]);
}

// Dumps live entries into caller-allocated arrays (size >= gidmap_size).
// Returns the number written. Used for checkpointing.
uint64_t gidmap_items(void* h, int64_t* out_keys, int64_t* out_vals,
                      uint64_t max_n) {
    GidMap* m = static_cast<GidMap*>(h);
    uint64_t w = 0;
    for (uint64_t i = 0; i < m->cap && w < max_n; i++) {
        if (m->keys[i] >= 0) {
            out_keys[w] = m->keys[i];
            out_vals[w] = m->vals[i];
            w++;
        }
    }
    return w;
}

}  // extern "C"
