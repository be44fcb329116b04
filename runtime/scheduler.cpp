// Periodic task scheduler with deadline accounting.
//
// Host-runtime counterpart of the reference's timing layer: ROS timers
// driving the control loops (AvoidanceStateMachine.cpp:109-110,
// bfctrl_node.cpp:84-86) and AirLib's ScheduledExecutor/FrequencyLimiter
// (AirLib/include/common/). Each registered task runs on its own thread at a
// fixed period; the scheduler tracks overruns and measured latency — the
// measured latency is exported so the Python side can feed it back as the
// MPC's `decay` lookahead, exactly like the reference measures its own solve
// time (AvoidanceStateMachine.cpp:329-343).

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

typedef void (*task_fn)(void* arg);

struct Task {
    task_fn fn;
    void* arg;
    double period_s;
    std::thread thread;
    std::atomic<bool> stop{false};
    std::atomic<uint64_t> ticks{0};
    std::atomic<uint64_t> overruns{0};
    std::atomic<double> last_latency_s{0.0};
    std::atomic<double> ewma_latency_s{0.0};
};

struct Scheduler {
    std::vector<Task*> tasks;
};

void run_task(Task* t) {
    auto next = Clock::now();
    const auto period = std::chrono::duration<double>(t->period_s);
    while (!t->stop.load(std::memory_order_relaxed)) {
        auto start = Clock::now();
        t->fn(t->arg);
        auto elapsed = std::chrono::duration<double>(Clock::now() - start).count();
        t->last_latency_s.store(elapsed, std::memory_order_relaxed);
        double ewma = t->ewma_latency_s.load(std::memory_order_relaxed);
        t->ewma_latency_s.store(0.8 * ewma + 0.2 * elapsed, std::memory_order_relaxed);
        t->ticks.fetch_add(1, std::memory_order_relaxed);
        next += std::chrono::duration_cast<Clock::duration>(period);
        if (Clock::now() > next) {
            t->overruns.fetch_add(1, std::memory_order_relaxed);
            next = Clock::now();  // skip missed slots; don't burst
        } else {
            std::this_thread::sleep_until(next);
        }
    }
}

}  // namespace

extern "C" {

void* scheduler_create() { return new Scheduler(); }

int scheduler_add_task(void* sched, task_fn fn, void* arg, double period_s) {
    auto* s = static_cast<Scheduler*>(sched);
    auto* t = new Task();
    t->fn = fn;
    t->arg = arg;
    t->period_s = period_s;
    s->tasks.push_back(t);
    return int(s->tasks.size()) - 1;
}

void scheduler_start(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    for (auto* t : s->tasks)
        if (!t->thread.joinable()) t->thread = std::thread(run_task, t);
}

void scheduler_stop(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    for (auto* t : s->tasks) t->stop.store(true);
    for (auto* t : s->tasks)
        if (t->thread.joinable()) t->thread.join();
}

void scheduler_destroy(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    scheduler_stop(sched);
    for (auto* t : s->tasks) delete t;
    delete s;
}

uint64_t scheduler_ticks(void* sched, int task) {
    return static_cast<Scheduler*>(sched)->tasks[task]->ticks.load();
}

uint64_t scheduler_overruns(void* sched, int task) {
    return static_cast<Scheduler*>(sched)->tasks[task]->overruns.load();
}

double scheduler_latency(void* sched, int task) {
    return static_cast<Scheduler*>(sched)->tasks[task]->ewma_latency_s.load();
}

}  // extern "C"
