// Ad-hoc raw-datagram connection — the runtime's equivalent of the
// reference's AdHocConnection (MavLinkCom/include/AdHocConnection.hpp;
// impl MavLinkCom/src/impl/AdHocConnectionImpl.cpp): a UDP link to a
// NON-MAVLink peer, used for discovery/auxiliary traffic.  Two modes,
// matching the reference factories:
//
//   * local  (connectLocalUdp):  bind a local port and LATCH the remote
//     address from the first datagram received, so replies go back to
//     whoever spoke first;
//   * remote (connectRemoteUdp): bind an ephemeral port and send to a known
//     remote address.
//
// Datagrams are raw bytes (no MAVLink framing, no CRC).  The reference
// delivers them through a subscribe callback; here a receive thread queues
// them and `adhoc_recv` pops with a timeout — the Python-side blocking
// analogue of the callback.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxDatagram = 65536;
constexpr size_t kMaxQueue = 256;  // drop-oldest beyond this

struct AdHoc {
    int fd = -1;
    std::thread rx;
    std::atomic<bool> stop{false};
    std::mutex mu;
    std::condition_variable cv;
    std::deque<std::vector<uint8_t>> queue;
    sockaddr_in remote{};
    std::atomic<bool> have_remote{false};
    std::atomic<uint64_t> received{0}, dropped{0};
};

void rx_loop(AdHoc* c) {
    std::vector<uint8_t> buf(kMaxDatagram);
    while (!c->stop.load()) {
        sockaddr_in from{};
        socklen_t fl = sizeof(from);
        ssize_t n = recvfrom(c->fd, buf.data(), buf.size(), 0,
                             reinterpret_cast<sockaddr*>(&from), &fl);
        if (n <= 0) continue;  // timeout tick or shutdown
        if (!c->have_remote.load()) {
            // local mode: latch whoever spoke first (AdHocConnectionImpl
            // remembers the sender for subsequent sendMessage calls)
            c->remote = from;
            c->have_remote.store(true);
        }
        c->received.fetch_add(1);
        std::lock_guard<std::mutex> lock(c->mu);
        if (c->queue.size() >= kMaxQueue) {
            c->queue.pop_front();
            c->dropped.fetch_add(1);
        }
        c->queue.emplace_back(buf.begin(), buf.begin() + n);
        c->cv.notify_one();
    }
}

AdHoc* make(int local_port, const char* remote_host, int remote_port) {
    auto* c = new AdHoc();
    c->fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (c->fd < 0) {
        delete c;
        return nullptr;
    }
    sockaddr_in local{};
    local.sin_family = AF_INET;
    local.sin_addr.s_addr = htonl(INADDR_ANY);
    local.sin_port = htons(static_cast<uint16_t>(local_port));
    if (bind(c->fd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) < 0) {
        close(c->fd);
        delete c;
        return nullptr;
    }
    timeval tv{0, 100000};  // 100 ms rx tick so the thread can exit
    setsockopt(c->fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    if (remote_host != nullptr) {
        c->remote.sin_family = AF_INET;
        c->remote.sin_port = htons(static_cast<uint16_t>(remote_port));
        inet_pton(AF_INET, remote_host, &c->remote.sin_addr);
        c->have_remote.store(true);
    }
    c->rx = std::thread(rx_loop, c);
    return c;
}

}  // namespace

extern "C" {

// connectLocalUdp analogue: listen on local_port, latch the first sender.
void* adhoc_create_local(int local_port) {
    return make(local_port, nullptr, 0);
}

// connectRemoteUdp analogue: ephemeral local port, fixed remote.
void* adhoc_create_remote(const char* host, int remote_port) {
    return make(0, host, remote_port);
}

// Send one raw datagram to the (configured or latched) remote.
// Returns bytes sent, or -1 (including "no remote known yet").
int adhoc_send(void* h, const uint8_t* data, int len) {
    auto* c = static_cast<AdHoc*>(h);
    if (!c->have_remote.load()) return -1;
    return static_cast<int>(sendto(
        c->fd, data, static_cast<size_t>(len), 0,
        reinterpret_cast<const sockaddr*>(&c->remote), sizeof(c->remote)));
}

// Pop the oldest queued datagram (blocking up to timeout_s).  Returns its
// length (truncated to out_cap), or 0 on timeout.
int adhoc_recv(void* h, uint8_t* out, int out_cap, double timeout_s) {
    auto* c = static_cast<AdHoc*>(h);
    std::unique_lock<std::mutex> lock(c->mu);
    if (!c->cv.wait_for(lock, std::chrono::duration<double>(timeout_s),
                        [c] { return !c->queue.empty(); }))
        return 0;
    auto msg = std::move(c->queue.front());
    c->queue.pop_front();
    lock.unlock();
    int n = static_cast<int>(msg.size());
    if (n > out_cap) n = out_cap;
    std::memcpy(out, msg.data(), static_cast<size_t>(n));
    return n;
}

uint64_t adhoc_received(void* h) {
    return static_cast<AdHoc*>(h)->received.load();
}

void adhoc_destroy(void* h) {
    auto* c = static_cast<AdHoc*>(h);
    c->stop.store(true);
    if (c->rx.joinable()) c->rx.join();
    close(c->fd);
    delete c;
}

}  // extern "C"
