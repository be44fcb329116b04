// Lock-free single-producer/single-consumer ring buffer for sensor frames.
//
// Host-runtime counterpart of the reference's per-topic callback queues +
// AsyncSpinners (airsim_ros_wrapper.h:164-172,468-475): a camera/IMU
// producer thread pushes fixed-size frames; the device-feeding consumer pops
// the freshest batch without locks. Slots are fixed-size (static shapes all
// the way down — the device side needs them anyway).
//
// Overflow policy is freshest-wins: when the ring is full the producer laps
// the oldest unread frame, mirroring how the reference's depth-image queues
// lag-drop. Lapping means the producer may overwrite a slot the consumer is
// concurrently reading, so each slot is guarded by a seqlock (even = stable,
// odd = write in progress); a reader that observes a version change mid-copy
// discards the torn copy and retries on a newer frame. All shared words are
// C++ atomics (relaxed data + acquire/release versions), so the protocol is
// data-race-free by the standard and TSAN-clean — verified by
// `make -C runtime sanitize` (stress.cpp under ASAN/UBSAN + TSAN).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FrameRing {
    std::vector<std::atomic<uint64_t>> words;  // capacity * words_per_slot
    std::vector<std::atomic<uint64_t>> ver;    // per-slot seqlock version
    std::vector<std::atomic<uint64_t>> stamp_bits;
    size_t slot_bytes = 0;
    size_t words_per_slot = 0;
    size_t capacity = 0;
    std::atomic<uint64_t> head{0};  // next write sequence number
    std::atomic<uint64_t> tail{0};  // next read sequence number
    std::atomic<uint64_t> dropped{0};
};

inline uint64_t stamp_to_bits(double s) {
    uint64_t b;
    std::memcpy(&b, &s, sizeof(b));
    return b;
}

inline double bits_to_stamp(uint64_t b) {
    double s;
    std::memcpy(&s, &b, sizeof(s));
    return s;
}

// Copy `n` bytes into the slot's atomic words (relaxed: the seqlock version
// stores provide the ordering). The tail word is zero-padded so a torn last
// word can never leak stale bytes past slot_bytes.
inline void store_slot(std::atomic<uint64_t>* dst, const uint8_t* src, size_t n) {
    size_t full = n / 8;
    for (size_t i = 0; i < full; ++i) {
        uint64_t w;
        std::memcpy(&w, src + 8 * i, 8);
        dst[i].store(w, std::memory_order_relaxed);
    }
    if (size_t rem = n % 8) {
        uint64_t w = 0;
        std::memcpy(&w, src + 8 * full, rem);
        dst[full].store(w, std::memory_order_relaxed);
    }
}

inline void load_slot(uint8_t* dst, const std::atomic<uint64_t>* src, size_t n) {
    size_t full = n / 8;
    for (size_t i = 0; i < full; ++i) {
        uint64_t w = src[i].load(std::memory_order_relaxed);
        std::memcpy(dst + 8 * i, &w, 8);
    }
    if (size_t rem = n % 8) {
        uint64_t w = src[full].load(std::memory_order_relaxed);
        std::memcpy(dst + 8 * full, &w, rem);
    }
}

// Seqlock-validated read of slot `slot` into (data, stamp). Returns false if
// the producer wrote the slot concurrently (copy was potentially torn).
// On success *ver_out is the slot version the copy was taken under — the
// caller must check it against expected_ver(seq): a consistent read is NOT
// enough, because the producer may have fully lapped the slot between the
// caller loading tail/head and the copy, leaving a stable frame from a
// LATER generation (seq + k*capacity) in place. Returning that frame for
// sequence `seq` breaks FIFO order (found by stress.cpp's monotonicity
// check under ASAN load).
bool read_slot(FrameRing* r, size_t slot, uint8_t* data, double* stamp,
               uint64_t* ver_out) {
    uint64_t v1 = r->ver[slot].load(std::memory_order_acquire);
    if (v1 & 1) return false;  // write in progress
    load_slot(data, &r->words[slot * r->words_per_slot], r->slot_bytes);
    uint64_t sb = r->stamp_bits[slot].load(std::memory_order_relaxed);
    std::atomic_thread_fence(std::memory_order_acquire);
    uint64_t v2 = r->ver[slot].load(std::memory_order_relaxed);
    if (v1 != v2) return false;  // overwritten mid-read
    *stamp = bits_to_stamp(sb);
    *ver_out = v1;
    return true;
}

// Slot version after the write of sequence number `seq` (versions start at 0
// and advance by 2 per publish; slot = seq % capacity receives its
// (seq/capacity + 1)-th write).
inline uint64_t expected_ver(const FrameRing* r, uint64_t seq) {
    return 2 * (seq / r->capacity) + 2;
}

}  // namespace

extern "C" {

void* frame_ring_create(size_t slot_bytes, size_t capacity) {
    auto* r = new FrameRing();
    r->slot_bytes = slot_bytes;
    r->words_per_slot = (slot_bytes + 7) / 8;
    r->capacity = capacity;
    r->words = std::vector<std::atomic<uint64_t>>(r->words_per_slot * capacity);
    r->ver = std::vector<std::atomic<uint64_t>>(capacity);
    r->stamp_bits = std::vector<std::atomic<uint64_t>>(capacity);
    return r;
}

void frame_ring_destroy(void* ring) { delete static_cast<FrameRing*>(ring); }

// Producer side. Always succeeds (returns 1); if the ring was full the
// oldest unread frame is skipped and counted in `dropped`.
int frame_ring_push(void* ring, const uint8_t* data, double stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    size_t slot = head % r->capacity;

    uint64_t v = r->ver[slot].load(std::memory_order_relaxed);
    r->ver[slot].store(v + 1, std::memory_order_relaxed);  // mark writing
    std::atomic_thread_fence(std::memory_order_release);
    store_slot(&r->words[slot * r->words_per_slot], data, r->slot_bytes);
    r->stamp_bits[slot].store(stamp_to_bits(stamp), std::memory_order_relaxed);
    r->ver[slot].store(v + 2, std::memory_order_release);  // publish

    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail >= r->capacity) {
        // advance tail: drop the oldest unread frame (CAS — the consumer may
        // be advancing it concurrently; whoever wins, tail only moves forward)
        if (r->tail.compare_exchange_strong(tail, tail + 1,
                                            std::memory_order_acq_rel))
            r->dropped.fetch_add(1, std::memory_order_relaxed);
    }
    r->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Consumer side. Returns 1 and fills (data, stamp) if a frame was available.
int frame_ring_pop(void* ring, uint8_t* data, double* stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    for (;;) {
        uint64_t tail = r->tail.load(std::memory_order_relaxed);
        uint64_t head = r->head.load(std::memory_order_acquire);
        if (tail >= head) return 0;
        size_t slot = tail % r->capacity;
        uint64_t v = 0;
        bool ok = read_slot(r, slot, data, stamp, &v);
        if (!ok || v != expected_ver(r, tail)) {
            // producer lapped this slot (mid-write, or a stable frame from a
            // later generation): the frame at `tail` is gone; let the
            // producer's CAS (or ours) skip it and retry on a newer frame
            r->tail.compare_exchange_strong(tail, tail + 1,
                                            std::memory_order_acq_rel);
            continue;
        }
        if (r->tail.compare_exchange_strong(tail, tail + 1,
                                            std::memory_order_acq_rel))
            return 1;
        // producer dropped `tail` from under us between copy and claim —
        // freshest-wins says discard our (valid) copy and take a newer frame
    }
}

// Pop only the newest frame, discarding older ones (latency-first consumers:
// the MPC wants the freshest depth image, not a backlog).
int frame_ring_pop_latest(void* ring, uint8_t* data, double* stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    for (;;) {
        uint64_t head = r->head.load(std::memory_order_acquire);
        uint64_t tail = r->tail.load(std::memory_order_relaxed);
        if (tail >= head) return 0;
        uint64_t newest = head - 1;
        uint64_t v = 0;
        if (!read_slot(r, newest % r->capacity, data, stamp, &v) ||
            v != expected_ver(r, newest))
            continue;  // producer lapped `newest`; reload head and retry
        if (r->tail.compare_exchange_strong(tail, head,
                                            std::memory_order_acq_rel))
            return 1;
        // tail moved (producer drop); our copy is still the newest-known
        // frame only if head didn't advance — recheck from the top
    }
}

uint64_t frame_ring_dropped(void* ring) {
    return static_cast<FrameRing*>(ring)->dropped.load(std::memory_order_relaxed);
}

uint64_t frame_ring_size(void* ring) {
    auto* r = static_cast<FrameRing*>(ring);
    uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    return head > tail ? head - tail : 0;
}

}  // extern "C"
