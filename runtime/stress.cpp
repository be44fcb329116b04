// Sanitizer stress harness for the native host runtime.
//
// Exercises every concurrent component under load so ASAN/UBSAN/TSAN can
// observe the real thread interleavings the Python host loop produces:
//   - frame ring: one camera-rate producer lapping a slow consumer
//     (freshest-wins overflow), with per-frame checksums to catch torn reads
//     independently of TSAN;
//   - scheduler: several periodic tasks starting/stopping concurrently
//     (the reference's ROS-timer layer, AvoidanceStateMachine.cpp:109-110);
//   - kdtree: concurrent read-only k-NN queries against one tree
//     (nanoflann_two.hpp usage pattern: build once, query from workers);
//   - mavlink: pack→byte-wise-feed round trips with adversarial noise
//     (MavLinkCom framing layer).
//
// Build + run via `make -C runtime sanitize` (both ASAN/UBSAN and TSAN
// binaries). Exit code 0 = all invariants held and no sanitizer report.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {
void* frame_ring_create(size_t slot_bytes, size_t capacity);
void frame_ring_destroy(void* ring);
int frame_ring_push(void* ring, const uint8_t* data, double stamp);
int frame_ring_pop(void* ring, uint8_t* data, double* stamp);
int frame_ring_pop_latest(void* ring, uint8_t* data, double* stamp);
uint64_t frame_ring_dropped(void* ring);
uint64_t frame_ring_size(void* ring);

void* scheduler_create();
typedef void (*task_fn)(void* arg);
int scheduler_add_task(void* sched, task_fn fn, void* arg, double period_s);
void scheduler_start(void* sched);
void scheduler_stop(void* sched);
void scheduler_destroy(void* sched);
uint64_t scheduler_ticks(void* sched, int task);
uint64_t scheduler_overruns(void* sched, int task);
double scheduler_latency(void* sched, int task);

void* kdtree_build(const float* points, int32_t n);
void kdtree_destroy(void* tree);
void kdtree_knn(void* tree, const float* queries, int32_t m, int32_t k,
                int32_t* out_idx, float* out_dist);

int mavlink2_pack(uint32_t msgid, const uint8_t* payload, size_t payload_len,
                  uint8_t seq, uint8_t sysid, uint8_t compid, uint8_t crc_extra,
                  uint8_t* out);
void* mavlink_parser_create();
void mavlink_parser_destroy(void* p);
int mavlink_parser_feed(void* pp, uint8_t byte, uint8_t crc_extra,
                        uint32_t* msgid, uint8_t* payload,
                        uint8_t* payload_len);
}

namespace {

int g_failures = 0;

void check(bool ok, const char* what) {
    if (!ok) {
        std::fprintf(stderr, "FAIL: %s\n", what);
        ++g_failures;
    }
}

// ---- frame ring -----------------------------------------------------------

// Frame layout: word[0] = frame index, word[1..n-2] = index ^ word#,
// word[n-1] = xor checksum. Any torn read breaks the checksum.
constexpr size_t kWords = 37;  // odd size → exercises the zero-padded tail
constexpr size_t kSlotBytes = kWords * 8 - 3;

void fill_frame(uint64_t idx, uint8_t* buf) {
    uint64_t w[kWords] = {};
    w[0] = idx;
    uint64_t x = idx;
    for (size_t i = 1; i + 1 < kWords; ++i) {
        w[i] = idx ^ (uint64_t(i) << 32);
        x ^= w[i];
    }
    w[kWords - 1] = x;
    std::memcpy(buf, w, kSlotBytes);
}

bool frame_ok(const uint8_t* buf) {
    uint64_t w[kWords] = {};
    std::memcpy(w, buf, kSlotBytes);
    uint64_t x = w[0];
    for (size_t i = 1; i + 1 < kWords; ++i) x ^= w[i];
    // last word is zero-padded past kSlotBytes by the ring; mask to match
    uint64_t want = w[kWords - 1];
    uint64_t got = x & ((uint64_t(1) << ((kSlotBytes % 8) * 8)) - 1);
    return got == (want & ((uint64_t(1) << ((kSlotBytes % 8) * 8)) - 1));
}

void stress_frame_ring() {
    void* ring = frame_ring_create(kSlotBytes, 8);
    // TSAN serializes every atomic access; its run uses a smaller count
    // (STRESS_FRAMES in the Makefile) to keep `make sanitize` interactive.
    uint64_t kFrames = 200000;
    if (const char* env = std::getenv("STRESS_FRAMES"))
        kFrames = std::strtoull(env, nullptr, 10);
    std::atomic<uint64_t> popped{0}, torn{0};
    std::atomic<bool> done{false};

    std::thread producer([&] {
        std::vector<uint8_t> buf(kSlotBytes);
        for (uint64_t i = 0; i < kFrames; ++i) {
            fill_frame(i, buf.data());
            frame_ring_push(ring, buf.data(), double(i));
        }
        done.store(true, std::memory_order_release);
    });
    std::thread consumer([&] {
        std::vector<uint8_t> buf(kSlotBytes);
        double stamp = 0.0;
        uint64_t last_idx = 0;
        bool latest = false;
        std::mt19937_64 rng(7);
        while (!done.load(std::memory_order_acquire) ||
               frame_ring_size(ring) > 0) {
            int ok = latest ? frame_ring_pop_latest(ring, buf.data(), &stamp)
                            : frame_ring_pop(ring, buf.data(), &stamp);
            latest = (rng() & 3) == 0;
            if (!ok) continue;
            if (!frame_ok(buf.data())) torn.fetch_add(1);
            uint64_t idx;
            std::memcpy(&idx, buf.data(), 8);
            check(idx == uint64_t(stamp), "ring stamp matches frame index");
            check(popped.load() == 0 || idx >= last_idx, "ring frames in order");
            last_idx = idx;
            popped.fetch_add(1);
        }
    });
    producer.join();
    consumer.join();
    check(torn.load() == 0, "ring frames never torn");
    check(popped.load() > 0, "ring consumer made progress");
    check(popped.load() + frame_ring_dropped(ring) <= kFrames,
          "ring conservation: popped + dropped <= pushed");
    std::printf("frame_ring: popped=%llu dropped=%llu torn=%llu\n",
                (unsigned long long)popped.load(),
                (unsigned long long)frame_ring_dropped(ring),
                (unsigned long long)torn.load());
    frame_ring_destroy(ring);
}

// ---- scheduler ------------------------------------------------------------

std::atomic<uint64_t> g_task_calls[4];

template <int I>
void tick_task(void*) {
    g_task_calls[I].fetch_add(1, std::memory_order_relaxed);
}

void stress_scheduler() {
    void* s = scheduler_create();
    int t0 = scheduler_add_task(s, tick_task<0>, nullptr, 0.001);
    int t1 = scheduler_add_task(s, tick_task<1>, nullptr, 0.002);
    int t2 = scheduler_add_task(s, tick_task<2>, nullptr, 0.005);
    int t3 = scheduler_add_task(s, tick_task<3>, nullptr, 0.0005);
    scheduler_start(s);
    scheduler_start(s);  // idempotent double-start
    std::this_thread::sleep_for(std::chrono::milliseconds(300));
    for (int t : {t0, t1, t2, t3}) {
        check(scheduler_ticks(s, t) > 0, "scheduler task ticked");
        check(scheduler_latency(s, t) >= 0.0, "scheduler latency sane");
        (void)scheduler_overruns(s, t);
    }
    scheduler_stop(s);
    uint64_t after = scheduler_ticks(s, t3);
    std::this_thread::sleep_for(std::chrono::milliseconds(20));
    check(scheduler_ticks(s, t3) == after, "scheduler stop() quiesces");
    scheduler_destroy(s);  // destroy also re-stops: must be safe
    std::printf("scheduler: calls=%llu/%llu/%llu/%llu\n",
                (unsigned long long)g_task_calls[0].load(),
                (unsigned long long)g_task_calls[1].load(),
                (unsigned long long)g_task_calls[2].load(),
                (unsigned long long)g_task_calls[3].load());
}

// ---- kdtree ---------------------------------------------------------------

void stress_kdtree() {
    constexpr int32_t kN = 5000, kQ = 256, kK = 3;
    std::mt19937 rng(11);
    std::uniform_real_distribution<float> u(-20.f, 20.f);
    std::vector<float> pts(3 * kN);
    for (auto& p : pts) p = u(rng);
    void* tree = kdtree_build(pts.data(), kN);

    std::vector<std::thread> workers;
    for (int w = 0; w < 4; ++w) {
        workers.emplace_back([&, w] {
            std::mt19937 r2(100 + w);
            std::uniform_real_distribution<float> uq(-25.f, 25.f);
            std::vector<float> q(3 * kQ), dist(kQ * kK);
            std::vector<int32_t> idx(kQ * kK);
            for (int rep = 0; rep < 20; ++rep) {
                for (auto& x : q) x = uq(r2);
                kdtree_knn(tree, q.data(), kQ, kK, idx.data(), dist.data());
                // spot-verify one query per rep against brute force
                int qi = rep % kQ;
                float best = 1e30f;
                for (int32_t i = 0; i < kN; ++i) {
                    float d = 0;
                    for (int c = 0; c < 3; ++c) {
                        float t = pts[3 * i + c] - q[3 * qi + c];
                        d += t * t;
                    }
                    if (d < best) best = d;
                }
                check(std::abs(dist[qi * kK] - best) <= 1e-3f * (1 + best),
                      "kdtree nearest matches brute force");
            }
        });
    }
    for (auto& t : workers) t.join();
    kdtree_destroy(tree);
    std::printf("kdtree: %d threads x 20 reps x %d queries ok\n", 4, kQ);
}

// ---- mavlink --------------------------------------------------------------

void stress_mavlink() {
    std::mt19937 rng(23);
    void* parser = mavlink_parser_create();
    std::vector<uint8_t> frame(512), payload_out(512);
    int decoded = 0;
    for (int rep = 0; rep < 2000; ++rep) {
        size_t plen = rep % 64;
        std::vector<uint8_t> payload(plen);
        for (auto& b : payload) b = uint8_t(rng());
        uint32_t msgid = rng() % 16777216;
        uint8_t crc_extra = uint8_t(rng());
        int n = mavlink2_pack(msgid, payload.data(), plen, 1, 1,
                              uint8_t(rep), crc_extra, frame.data());
        check(n > 0 && n <= 512, "mavlink pack size sane");
        // inject random garbage between frames (parser must resync)
        int garbage = rng() % 8;
        for (int g = 0; g < garbage; ++g) {
            uint32_t mid;
            uint8_t pl;
            mavlink_parser_feed(parser, uint8_t(rng() & 0xFC), crc_extra, &mid,
                                payload_out.data(), &pl);
        }
        int got = 0;
        for (int i = 0; i < n; ++i) {
            uint32_t mid;
            uint8_t pl;
            if (mavlink_parser_feed(parser, frame[i], crc_extra, &mid,
                                    payload_out.data(), &pl)) {
                got = 1;
                check(mid == msgid, "mavlink msgid round-trips");
                // pack trims trailing zero bytes (v2 payload truncation)
                check(pl <= plen, "mavlink payload length sane");
                check(pl == 0 || std::memcmp(payload_out.data(), payload.data(),
                                             pl) == 0,
                      "mavlink payload round-trips");
            }
        }
        decoded += got;
    }
    // garbage may eat into a following frame's magic byte; most must decode
    check(decoded > 1800, "mavlink decodes despite injected noise");
    mavlink_parser_destroy(parser);
    std::printf("mavlink: %d/2000 frames decoded through noise\n", decoded);
}

}  // namespace

int main() {
    stress_frame_ring();
    stress_scheduler();
    stress_kdtree();
    stress_mavlink();
    if (g_failures) {
        std::fprintf(stderr, "%d failures\n", g_failures);
        return 1;
    }
    std::printf("all stress checks passed\n");
    return 0;
}
