// Lock-free single-producer/single-consumer ring buffer for sensor frames.
//
// Host-runtime counterpart of the reference's per-topic callback queues +
// AsyncSpinners (airsim_ros_wrapper.h:164-172,468-475): a camera/IMU
// producer thread pushes fixed-size frames; the device-feeding consumer pops
// the freshest batch without locks. Slots are fixed-size (static shapes all
// the way down — the device side needs them anyway).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FrameRing {
    std::vector<uint8_t> storage;
    std::vector<double> stamps;
    size_t slot_bytes = 0;
    size_t capacity = 0;
    std::atomic<uint64_t> head{0};  // next write sequence number
    std::atomic<uint64_t> tail{0};  // next read sequence number
    std::atomic<uint64_t> dropped{0};
};

}  // namespace

extern "C" {

void* frame_ring_create(size_t slot_bytes, size_t capacity) {
    auto* r = new FrameRing();
    r->slot_bytes = slot_bytes;
    r->capacity = capacity;
    r->storage.resize(slot_bytes * capacity);
    r->stamps.resize(capacity);
    return r;
}

void frame_ring_destroy(void* ring) { delete static_cast<FrameRing*>(ring); }

// Producer side. Returns 1 on success, 0 if the ring was full (frame dropped
// — freshest-wins policy: on overflow the *oldest* unread frame is skipped,
// mirroring how the reference's queues of depth images lag-drop).
int frame_ring_push(void* ring, const uint8_t* data, double stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    if (head - tail >= r->capacity) {
        // advance tail: drop the oldest unread frame
        r->tail.compare_exchange_strong(tail, tail + 1, std::memory_order_acq_rel);
        r->dropped.fetch_add(1, std::memory_order_relaxed);
    }
    size_t slot = head % r->capacity;
    std::memcpy(&r->storage[slot * r->slot_bytes], data, r->slot_bytes);
    r->stamps[slot] = stamp;
    r->head.store(head + 1, std::memory_order_release);
    return 1;
}

// Consumer side. Returns 1 and fills (data, stamp) if a frame was available.
int frame_ring_pop(void* ring, uint8_t* data, double* stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail >= head) return 0;
    size_t slot = tail % r->capacity;
    std::memcpy(data, &r->storage[slot * r->slot_bytes], r->slot_bytes);
    *stamp = r->stamps[slot];
    r->tail.store(tail + 1, std::memory_order_release);
    return 1;
}

// Pop only the newest frame, discarding older ones (latency-first consumers:
// the MPC wants the freshest depth image, not a backlog).
int frame_ring_pop_latest(void* ring, uint8_t* data, double* stamp) {
    auto* r = static_cast<FrameRing*>(ring);
    uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    if (tail >= head) return 0;
    uint64_t newest = head - 1;
    size_t slot = newest % r->capacity;
    std::memcpy(data, &r->storage[slot * r->slot_bytes], r->slot_bytes);
    *stamp = r->stamps[slot];
    r->tail.store(head, std::memory_order_release);
    return 1;
}

uint64_t frame_ring_dropped(void* ring) {
    return static_cast<FrameRing*>(ring)->dropped.load(std::memory_order_relaxed);
}

uint64_t frame_ring_size(void* ring) {
    auto* r = static_cast<FrameRing*>(ring);
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_acquire);
}

}  // extern "C"
