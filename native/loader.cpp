// Native batch loader for two-person motion clips.
//
// The training input pipeline's hot host path — window sampling,
// Z-normalization, and role-swap over (2, T, D) float32 clips — implemented
// in multithreaded C++ and exposed through a C ABI for ctypes. The Python
// pipeline (hig_tpu/data/dataset.py) stays the reference implementation;
// this loader is a drop-in fast path producing identical fixed-shape
// batches (window selection uses its own deterministic counter RNG).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libhig_loader.so loader.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Clip {
    std::vector<float> data;  // (2, T, D) row-major
    int64_t T;                // rows incl. trailing init token
    int64_t D;
};

struct Store {
    std::vector<Clip> clips;
    std::vector<float> mean;  // (D + 4)
    std::vector<float> std;   // (D + 4)
    int64_t D = 0;
};

// splitmix64: deterministic per (seed, epoch, item) stream.
inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

inline uint64_t rng_uniform(uint64_t key, uint64_t bound) {
    return bound ? splitmix64(key) % bound : 0;
}

void sample_one(const Store& s, int64_t clip_idx, uint64_t key, int64_t window,
                int swap, float* out, int32_t* length_out) {
    const Clip& c = s.clips[clip_idx];
    const int64_t D = c.D;
    const int64_t nframes = c.T - 1;
    const int64_t W = window + 1;  // + init token at index 0

    // frame indices (ref: mul_dataset.py:186-201)
    std::vector<int64_t> ix(W);
    ix[0] = nframes;  // init row
    if (window > nframes) {
        for (int64_t i = 0; i < nframes; ++i) ix[1 + i] = i;
        for (int64_t i = nframes; i < window; ++i) ix[1 + i] = nframes - 1;
    } else {
        int64_t shift_max = nframes - window;
        int64_t hi = shift_max > 0 ? shift_max : 1;
        int64_t shift = (int64_t)rng_uniform(key, (uint64_t)hi);
        for (int64_t i = 0; i < window; ++i) ix[1 + i] = shift + i;
    }

    const float* mean = s.mean.data();
    const float* stdv = s.std.data();
    const float* init_mean = mean + D;
    const float* init_std = stdv + D;

    for (int64_t actor_out = 0; actor_out < 2; ++actor_out) {
        int64_t actor_in = swap ? 1 - actor_out : actor_out;
        const float* src_base = c.data.data() + actor_in * c.T * D;
        float* dst_base = out + actor_out * W * D;
        // init token: channels 0:4 normalized by init stats, rest raw
        {
            const float* src = src_base + ix[0] * D;
            float* dst = dst_base;
            for (int64_t d = 0; d < D; ++d) dst[d] = src[d];
            for (int64_t d = 0; d < 4; ++d)
                dst[d] = (src[d] - init_mean[d]) / init_std[d];
        }
        for (int64_t t = 1; t < W; ++t) {
            const float* src = src_base + ix[t] * D;
            float* dst = dst_base + t * D;
            for (int64_t d = 0; d < D; ++d)
                dst[d] = (src[d] - mean[d]) / stdv[d];
        }
    }
    int64_t len = c.T < W ? c.T : W;
    *length_out = (int32_t)len;
}

}  // namespace

extern "C" {

void* hig_store_create(const float* mean, const float* stdv, int64_t D) {
    Store* s = new Store();
    s->D = D;
    s->mean.assign(mean, mean + D + 4);
    s->std.assign(stdv, stdv + D + 4);
    return s;
}

void hig_store_destroy(void* handle) { delete static_cast<Store*>(handle); }

int64_t hig_store_add_clip(void* handle, const float* data, int64_t T, int64_t D) {
    Store* s = static_cast<Store*>(handle);
    Clip c;
    c.T = T;
    c.D = D;
    c.data.assign(data, data + 2 * T * D);
    s->clips.push_back(std::move(c));
    return (int64_t)s->clips.size() - 1;
}

int64_t hig_store_size(void* handle) {
    return (int64_t)static_cast<Store*>(handle)->clips.size();
}

// Fill a batch: out (B, 2, window+1, D), lengths (B,).
// swap_flags may be null (no role swaps).
void hig_sample_batch(void* handle, const int64_t* clip_indices,
                      const uint8_t* swap_flags, int64_t batch,
                      int64_t window, uint64_t seed, uint64_t epoch,
                      float* out, int32_t* lengths, int64_t num_threads) {
    Store* s = static_cast<Store*>(handle);
    const int64_t D = s->D;
    const int64_t W = window + 1;
    int64_t nt = num_threads > 0 ? num_threads : 1;
    if (nt > batch) nt = batch;

    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t b = lo; b < hi; ++b) {
            uint64_t key = splitmix64(seed * 0x9E3779B97F4A7C15ull + epoch) ^
                           splitmix64((uint64_t)clip_indices[b] + 0x1234567ull + b);
            sample_one(*s, clip_indices[b], key,
                       window, swap_flags ? swap_flags[b] : 0,
                       out + b * 2 * W * D, lengths + b);
        }
    };
    if (nt <= 1) {
        work(0, batch);
        return;
    }
    std::vector<std::thread> threads;
    int64_t chunk = (batch + nt - 1) / nt;
    for (int64_t i = 0; i < nt; ++i) {
        int64_t lo = i * chunk;
        int64_t hi = lo + chunk < batch ? lo + chunk : batch;
        if (lo >= hi) break;
        threads.emplace_back(work, lo, hi);
    }
    for (auto& t : threads) t.join();
}

}  // extern "C"
