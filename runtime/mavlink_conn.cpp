// MAVLink UDP connection layer — the transport the v2 codec (mavlink.cpp)
// plugs into.  Fills the MavLinkConnection / MavLinkVehicle roles of the
// reference's MavLinkCom (MavLinkCom/src/MavLinkConnection.cpp: socket +
// receive thread + heartbeat bookkeeping; MavLinkVehicle.cpp: typed
// vehicle-state ingestion), consumed on the reference vehicle by
// betaflight_ctrl/src/input.cpp:15-104 (odometry in) and output.cpp
// (attitude setpoints out).
//
// Design: one UDP socket per connection (point-to-point, like MavLinkCom's
// UdpClientPort).  A receive thread drains datagrams through the
// incremental parser's auto-CRC feed and latches the latest typed decode of
// each handled message (HEARTBEAT -> link watchdog clock; ATTITUDE +
// LOCAL_POSITION_NED -> vehicle state; SET_ATTITUDE_TARGET -> what a
// vehicle-role endpoint receives from the controller).  Outgoing periodic
// streams (1 Hz HEARTBEAT + rate-configurable SET_ATTITUDE_TARGET of the
// latest stored setpoint) run as tasks on the runtime's periodic scheduler
// (scheduler.cpp) — the ScheduledExecutor analogue.
//
// All shared state is mutex-latched (tiny critical sections, host-side
// rates are <= a few kHz); the heartbeat clock is monotonic.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>

// ---- codec (mavlink.cpp) ----
extern "C" {
void* mavlink_parser_create();
void mavlink_parser_destroy(void* p);
int mavlink_parser_feed_auto(void* pp, uint8_t byte, uint32_t* msgid,
                             uint8_t* payload, uint8_t* payload_len);
int mavlink2_pack_heartbeat(uint32_t custom_mode, uint8_t type,
                            uint8_t autopilot, uint8_t base_mode,
                            uint8_t system_status, uint8_t seq, uint8_t sysid,
                            uint8_t compid, uint8_t* out);
int mavlink2_pack_set_attitude_target(uint32_t time_boot_ms, const float q[4],
                                      float roll_rate, float pitch_rate,
                                      float yaw_rate, float thrust,
                                      uint8_t target_system,
                                      uint8_t target_component,
                                      uint8_t type_mask, uint8_t seq,
                                      uint8_t sysid, uint8_t compid,
                                      uint8_t* out);
int mavlink2_pack_attitude(uint32_t time_boot_ms, const float rpy[3],
                           const float rates[3], uint8_t seq, uint8_t sysid,
                           uint8_t compid, uint8_t* out);
int mavlink2_pack_local_position_ned(uint32_t time_boot_ms, const float xyz[3],
                                     const float vxyz[3], uint8_t seq,
                                     uint8_t sysid, uint8_t compid,
                                     uint8_t* out);
int mavlink2_pack_command_long(const float params7[7], uint16_t command,
                               uint8_t target_system, uint8_t target_component,
                               uint8_t confirmation, uint8_t seq, uint8_t sysid,
                               uint8_t compid, uint8_t* out);
// ---- scheduler (scheduler.cpp) ----
typedef void (*task_fn)(void* arg);
void* scheduler_create();
int scheduler_add_task(void* sched, task_fn fn, void* arg, double period_s);
void scheduler_start(void* sched);
void scheduler_destroy(void* sched);
}

namespace {

using Clock = std::chrono::steady_clock;

inline double now_s() {
    return std::chrono::duration<double>(Clock::now().time_since_epoch())
        .count();
}

// zero-extend a (possibly v2-truncated) payload to the full wire size
inline void expand(const uint8_t* payload, uint8_t plen, uint8_t* full,
                   size_t full_len) {
    std::memset(full, 0, full_len);
    std::memcpy(full, payload, plen < full_len ? plen : full_len);
}

struct Conn {
    int fd = -1;
    bool is_stream = false;  // TCP: connected socket, send() not sendto()
    sockaddr_in remote{};
    uint8_t sysid, compid;
    std::atomic<uint8_t> seq{0};

    std::thread rx_thread;
    std::atomic<bool> stop{false};
    void* parser = nullptr;

    std::mutex mu;
    // watchdog + counters
    double last_heartbeat_s = -1.0;
    uint64_t rx_frames = 0, crc_errors = 0, unknown = 0;
    uint64_t hb_count = 0, att_count = 0, lpn_count = 0, tgt_count = 0,
             cmd_count = 0;
    // latest typed decodes
    float attitude[7] = {0};      // time_s, roll, pitch, yaw, p, q, r
    float local_pos[7] = {0};     // time_s, x, y, z, vx, vy, vz
    float att_target[10] = {0};   // time_s, q0..q3, p, q, r, thrust, type_mask
    float cmd_long[8] = {0};      // param1..7, command
    // latest outgoing setpoint for the periodic stream
    float out_q[4] = {1, 0, 0, 0};
    float out_rates[3] = {0, 0, 0};
    float out_thrust = 0.0f;
    uint8_t out_mask = 0;
    bool have_setpoint = false;

    void* sched = nullptr;  // owns the periodic TX tasks once started
};

void handle_frame(Conn* c, uint32_t msgid, const uint8_t* payload,
                  uint8_t plen) {
    uint8_t full[64];
    std::lock_guard<std::mutex> lock(c->mu);
    c->rx_frames++;
    switch (msgid) {
        case 0: {  // HEARTBEAT -> link-liveness clock
            c->last_heartbeat_s = now_s();
            c->hb_count++;
            break;
        }
        case 30: {  // ATTITUDE
            expand(payload, plen, full, 28);
            uint32_t t;
            std::memcpy(&t, full, 4);
            c->attitude[0] = static_cast<float>(t) * 1e-3f;
            std::memcpy(c->attitude + 1, full + 4, 24);
            c->att_count++;
            break;
        }
        case 32: {  // LOCAL_POSITION_NED
            expand(payload, plen, full, 28);
            uint32_t t;
            std::memcpy(&t, full, 4);
            c->local_pos[0] = static_cast<float>(t) * 1e-3f;
            std::memcpy(c->local_pos + 1, full + 4, 24);
            c->lpn_count++;
            break;
        }
        case 82: {  // SET_ATTITUDE_TARGET (vehicle-role receive)
            expand(payload, plen, full, 39);
            uint32_t t;
            std::memcpy(&t, full, 4);
            c->att_target[0] = static_cast<float>(t) * 1e-3f;
            std::memcpy(c->att_target + 1, full + 4, 32);  // q4 + rates3 + thrust
            c->att_target[9] = static_cast<float>(full[38]);  // type_mask
            c->tgt_count++;
            break;
        }
        case 76: {  // COMMAND_LONG
            expand(payload, plen, full, 33);
            std::memcpy(c->cmd_long, full, 28);
            uint16_t cmd;
            std::memcpy(&cmd, full + 28, 2);
            c->cmd_long[7] = static_cast<float>(cmd);
            c->cmd_count++;
            break;
        }
        default:
            c->unknown++;
    }
}

void rx_loop(Conn* c) {
    uint8_t dgram[2048], payload[256];
    while (!c->stop.load(std::memory_order_relaxed)) {
        ssize_t n = recv(c->fd, dgram, sizeof(dgram), 0);
        if (n <= 0) continue;  // timeout or spurious wake
        for (ssize_t i = 0; i < n; ++i) {
            uint32_t msgid;
            uint8_t plen;
            int r = mavlink_parser_feed_auto(c->parser, dgram[i], &msgid,
                                             payload, &plen);
            if (r == 1) {
                handle_frame(c, msgid, payload, plen);
            } else if (r == -1) {
                std::lock_guard<std::mutex> lock(c->mu);
                c->crc_errors++;
            } else if (r == -2) {
                std::lock_guard<std::mutex> lock(c->mu);
                c->unknown++;
            }
        }
    }
}

int send_frame(Conn* c, const uint8_t* frame, int len) {
    ssize_t n;
    if (c->is_stream) {
        n = send(c->fd, frame, static_cast<size_t>(len), MSG_NOSIGNAL);
    } else {
        n = sendto(c->fd, frame, static_cast<size_t>(len), 0,
                   reinterpret_cast<const sockaddr*>(&c->remote),
                   sizeof(c->remote));
    }
    return n == len ? 0 : -1;
}

Conn* wrap_stream_fd(int fd, uint8_t sysid, uint8_t compid) {
    timeval tv{0, 50 * 1000};  // 50 ms rx poll so stop() is prompt
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    auto* c = new Conn();
    c->fd = fd;
    c->is_stream = true;
    c->sysid = sysid;
    c->compid = compid;
    c->parser = mavlink_parser_create();
    c->rx_thread = std::thread(rx_loop, c);
    return c;
}

void hb_task(void* arg) {
    auto* c = static_cast<Conn*>(arg);
    uint8_t frame[32];
    // type 6 = MAV_TYPE_GCS for the controller role; status 4 = ACTIVE
    int len = mavlink2_pack_heartbeat(0, 6, 8, 0, 4,
                                      c->seq.fetch_add(1), c->sysid,
                                      c->compid, frame);
    send_frame(c, frame, len);
}

void att_task(void* arg) {
    auto* c = static_cast<Conn*>(arg);
    float q[4], rates[3], thrust;
    uint8_t mask;
    {
        std::lock_guard<std::mutex> lock(c->mu);
        if (!c->have_setpoint) return;
        std::memcpy(q, c->out_q, sizeof(q));
        std::memcpy(rates, c->out_rates, sizeof(rates));
        thrust = c->out_thrust;
        mask = c->out_mask;
    }
    auto ms = static_cast<uint32_t>(now_s() * 1e3);
    uint8_t frame[64];
    int len = mavlink2_pack_set_attitude_target(
        ms, q, rates[0], rates[1], rates[2], thrust, 1, 1, mask,
        c->seq.fetch_add(1), c->sysid, c->compid, frame);
    send_frame(c, frame, len);
}

}  // namespace

extern "C" {

// Open a point-to-point UDP MAVLink endpoint: bind local_port, send to
// remote_host:remote_port.  Starts the receive thread.  NULL on failure.
void* mav_conn_create(uint16_t local_port, const char* remote_host,
                      uint16_t remote_port, uint8_t sysid, uint8_t compid) {
    int fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return nullptr;
    int one = 1;
    setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    timeval tv{0, 50 * 1000};  // 50 ms rx poll so stop() is prompt
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    sockaddr_in local{};
    local.sin_family = AF_INET;
    local.sin_addr.s_addr = htonl(INADDR_ANY);
    local.sin_port = htons(local_port);
    if (bind(fd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) != 0) {
        close(fd);
        return nullptr;
    }
    auto* c = new Conn();
    c->fd = fd;
    c->remote.sin_family = AF_INET;
    c->remote.sin_port = htons(remote_port);
    if (inet_pton(AF_INET, remote_host, &c->remote.sin_addr) != 1) {
        close(fd);
        delete c;
        return nullptr;
    }
    c->sysid = sysid;
    c->compid = compid;
    c->parser = mavlink_parser_create();
    c->rx_thread = std::thread(rx_loop, c);
    return c;
}

// TCP transports (the reference's MavLinkCom connectLocalTcp /
// connectRemoteTcp, MavLinkCom/src/MavLinkConnection.cpp).  The MAVLink
// parser is stream-safe (per-byte feed with resync), so the same rx loop
// serves datagrams and streams; framing needs no length prefix.  Serial
// remains out of scope (no hardware in this environment) — documented in
// PARITY.md.

// Listen on port, block up to timeout_s for ONE peer, then behave exactly
// like the UDP connection.  NULL on failure/timeout.
void* mav_conn_create_tcp_server(uint16_t port, double timeout_s,
                                 uint8_t sysid, uint8_t compid) {
    int lfd = socket(AF_INET, SOCK_STREAM, 0);
    if (lfd < 0) return nullptr;
    int one = 1;
    setsockopt(lfd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in local{};
    local.sin_family = AF_INET;
    local.sin_addr.s_addr = htonl(INADDR_ANY);
    local.sin_port = htons(port);
    if (bind(lfd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) != 0 ||
        listen(lfd, 1) != 0) {
        close(lfd);
        return nullptr;
    }
    timeval tv{};
    tv.tv_sec = static_cast<long>(timeout_s);
    tv.tv_usec = static_cast<long>((timeout_s - tv.tv_sec) * 1e6);
    setsockopt(lfd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    int fd = accept(lfd, nullptr, nullptr);
    close(lfd);
    if (fd < 0) return nullptr;
    return wrap_stream_fd(fd, sysid, compid);
}

// Connect to host:port, retrying until timeout_s.  NULL on failure.
void* mav_conn_create_tcp_client(const char* host, uint16_t port,
                                 double timeout_s, uint8_t sysid,
                                 uint8_t compid) {
    sockaddr_in remote{};
    remote.sin_family = AF_INET;
    remote.sin_port = htons(port);
    if (inet_pton(AF_INET, host, &remote.sin_addr) != 1) return nullptr;
    double deadline = now_s() + timeout_s;
    while (true) {
        int fd = socket(AF_INET, SOCK_STREAM, 0);
        if (fd < 0) return nullptr;
        if (connect(fd, reinterpret_cast<sockaddr*>(&remote),
                    sizeof(remote)) == 0) {
            return wrap_stream_fd(fd, sysid, compid);
        }
        close(fd);
        if (now_s() >= deadline) return nullptr;
        usleep(20 * 1000);
    }
}

void mav_conn_destroy(void* h) {
    auto* c = static_cast<Conn*>(h);
    c->stop.store(true);
    if (c->sched) scheduler_destroy(c->sched);  // joins TX tasks
    if (c->rx_thread.joinable()) c->rx_thread.join();
    mavlink_parser_destroy(c->parser);
    close(c->fd);
    delete c;
}

// ---- outgoing -------------------------------------------------------------

int mav_conn_send_heartbeat(void* h) {
    hb_task(h);
    return 0;
}

// Latch the setpoint the periodic stream flies (and optionally send one
// frame immediately when `send_now`).
int mav_conn_set_attitude_target(void* h, const float q[4],
                                 const float rates[3], float thrust,
                                 uint8_t type_mask, int send_now) {
    auto* c = static_cast<Conn*>(h);
    {
        std::lock_guard<std::mutex> lock(c->mu);
        std::memcpy(c->out_q, q, sizeof(c->out_q));
        std::memcpy(c->out_rates, rates, sizeof(c->out_rates));
        c->out_thrust = thrust;
        c->out_mask = type_mask;
        c->have_setpoint = true;
    }
    if (send_now) att_task(c);
    return 0;
}

int mav_conn_send_attitude(void* h, float time_s, const float rpy[3],
                           const float rates[3]) {
    auto* c = static_cast<Conn*>(h);
    uint8_t frame[64];
    int len = mavlink2_pack_attitude(static_cast<uint32_t>(time_s * 1e3), rpy,
                                     rates, c->seq.fetch_add(1), c->sysid,
                                     c->compid, frame);
    return send_frame(c, frame, len);
}

int mav_conn_send_local_position(void* h, float time_s, const float xyz[3],
                                 const float vxyz[3]) {
    auto* c = static_cast<Conn*>(h);
    uint8_t frame[64];
    int len = mavlink2_pack_local_position_ned(
        static_cast<uint32_t>(time_s * 1e3), xyz, vxyz, c->seq.fetch_add(1),
        c->sysid, c->compid, frame);
    return send_frame(c, frame, len);
}

int mav_conn_send_command_long(void* h, const float params7[7],
                               uint16_t command, uint8_t target_system,
                               uint8_t target_component) {
    auto* c = static_cast<Conn*>(h);
    uint8_t frame[64];
    int len = mavlink2_pack_command_long(params7, command, target_system,
                                         target_component, 0,
                                         c->seq.fetch_add(1), c->sysid,
                                         c->compid, frame);
    return send_frame(c, frame, len);
}

// Start the periodic TX streams on the runtime scheduler: HEARTBEAT at
// hb_hz (reference: 1 Hz) + the latched SET_ATTITUDE_TARGET at att_hz
// (reference: the 50 Hz offboard stream).  Idempotent.
int mav_conn_start_streams(void* h, double hb_hz, double att_hz) {
    auto* c = static_cast<Conn*>(h);
    if (c->sched) return 0;
    c->sched = scheduler_create();
    if (hb_hz > 0) scheduler_add_task(c->sched, hb_task, c, 1.0 / hb_hz);
    if (att_hz > 0) scheduler_add_task(c->sched, att_task, c, 1.0 / att_hz);
    scheduler_start(c->sched);
    return 0;
}

// ---- incoming state -------------------------------------------------------

// Seconds since the peer's last HEARTBEAT; very large when never seen.
double mav_conn_heartbeat_age(void* h) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    if (c->last_heartbeat_s < 0) return 1e18;
    return now_s() - c->last_heartbeat_s;
}

// Link-loss watchdog: 1 while the heartbeat age is under `timeout_s` — the
// gate the bfctrl staleness logic consumes (reference: MavLinkConnection's
// heartbeat timeout flipping the failsafe).
int mav_conn_link_ok(void* h, double timeout_s) {
    return mav_conn_heartbeat_age(h) < timeout_s ? 1 : 0;
}

void mav_conn_stats(void* h, uint64_t out[8]) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    out[0] = c->rx_frames;
    out[1] = c->crc_errors;
    out[2] = c->unknown;
    out[3] = c->hb_count;
    out[4] = c->att_count;
    out[5] = c->lpn_count;
    out[6] = c->tgt_count;
    out[7] = c->cmd_count;
}

int mav_conn_attitude(void* h, float out[7]) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    std::memcpy(out, c->attitude, sizeof(c->attitude));
    return static_cast<int>(c->att_count);
}

int mav_conn_local_position(void* h, float out[7]) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    std::memcpy(out, c->local_pos, sizeof(c->local_pos));
    return static_cast<int>(c->lpn_count);
}

int mav_conn_attitude_target(void* h, float out[10]) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    std::memcpy(out, c->att_target, sizeof(c->att_target));
    return static_cast<int>(c->tgt_count);
}

int mav_conn_command_long(void* h, float out[8]) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    std::memcpy(out, c->cmd_long, sizeof(c->cmd_long));
    return static_cast<int>(c->cmd_count);
}

}  // extern "C"
