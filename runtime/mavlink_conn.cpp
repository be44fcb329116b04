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
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <termios.h>
#include <unistd.h>

#include <cerrno>
#include <cstdio>

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
int mavlink2_pack_raw(uint32_t msgid, const uint8_t* payload,
                      size_t payload_len, uint8_t seq, uint8_t sysid,
                      uint8_t compid, uint8_t* out);
int mavlink_parser_last_frame(void* pp, const uint8_t** frame);
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

// raw-frame subscriber (FTP / video / custom microservices): invoked from
// the receive thread for EVERY CRC-valid frame, after the typed latches,
// with the connection mutex released (the reference's
// MavLinkConnection::subscribe fan-out).
typedef void (*mav_raw_cb)(void* ctx, uint32_t msgid, const uint8_t* payload,
                           uint8_t payload_len);
constexpr int kMaxSubscribers = 4;

struct Conn {
    int fd = -1;
    bool is_stream = false;  // TCP: connected socket, send() not sendto()
    bool is_serial = false;  // tty: read()/write(), no socket opts
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

    // raw-frame subscribers (slot array; registration is rare)
    std::mutex sub_mu;
    mav_raw_cb subs[kMaxSubscribers] = {nullptr};
    void* sub_ctx[kMaxSubscribers] = {nullptr};

    // .tlog capture: 8-byte big-endian epoch-microseconds + raw frame, both
    // directions (the MavLinkFileLog role, MavLinkCom/src/MavLinkLog.cpp)
    std::mutex log_mu;
    FILE* log_fp = nullptr;
};

void log_frame(Conn* c, const uint8_t* frame, int len) {
    std::lock_guard<std::mutex> lock(c->log_mu);
    if (!c->log_fp) return;
    auto us = static_cast<uint64_t>(
        std::chrono::duration_cast<std::chrono::microseconds>(
            std::chrono::system_clock::now().time_since_epoch())
            .count());
    uint8_t ts[8];
    for (int i = 0; i < 8; ++i)
        ts[i] = static_cast<uint8_t>((us >> (8 * (7 - i))) & 0xFF);
    fwrite(ts, 1, 8, c->log_fp);
    fwrite(frame, 1, static_cast<size_t>(len), c->log_fp);
}

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
        ssize_t n = c->is_serial ? read(c->fd, dgram, sizeof(dgram))
                                 : recv(c->fd, dgram, sizeof(dgram), 0);
        if (n <= 0) continue;  // timeout or spurious wake
        for (ssize_t i = 0; i < n; ++i) {
            uint32_t msgid;
            uint8_t plen;
            int r = mavlink_parser_feed_auto(c->parser, dgram[i], &msgid,
                                             payload, &plen);
            if (r == 1) {
                const uint8_t* raw;
                int raw_len = mavlink_parser_last_frame(c->parser, &raw);
                log_frame(c, raw, raw_len);
                handle_frame(c, msgid, payload, plen);
                // subscriber fan-out, connection mutex released (handlers
                // may send on this same connection)
                mav_raw_cb cbs[kMaxSubscribers];
                void* ctxs[kMaxSubscribers];
                {
                    std::lock_guard<std::mutex> lock(c->sub_mu);
                    std::memcpy(cbs, c->subs, sizeof(cbs));
                    std::memcpy(ctxs, c->sub_ctx, sizeof(ctxs));
                }
                for (int s = 0; s < kMaxSubscribers; ++s)
                    if (cbs[s]) cbs[s](ctxs[s], msgid, payload, plen);
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
    if (c->is_serial || c->is_stream) {
        // Byte streams must write the WHOLE frame: a short write would leave
        // a partial frame in the stream, desyncing the peer's parser (it
        // drops the frame and resyncs on the next magic).  Plausible under
        // buffer pressure, e.g. 65+ back-to-back ENCAPSULATED_DATA frames
        // during video streaming — so loop until written or hard error.
        int off = 0;
        while (off < len) {
            ssize_t n =
                c->is_serial
                    ? write(c->fd, frame + off, static_cast<size_t>(len - off))
                    : send(c->fd, frame + off, static_cast<size_t>(len - off),
                           MSG_NOSIGNAL);
            if (n > 0) {
                off += static_cast<int>(n);
                continue;
            }
            if (n < 0 && (errno == EINTR || errno == EAGAIN ||
                          errno == EWOULDBLOCK))
                continue;  // transient: retry the remainder
            return -1;     // hard error (peer gone, fd closed, ...)
        }
        log_frame(c, frame, len);
        return 0;
    }
    // Datagram: all-or-nothing by construction.
    ssize_t n = sendto(c->fd, frame, static_cast<size_t>(len), 0,
                       reinterpret_cast<const sockaddr*>(&c->remote),
                       sizeof(c->remote));
    if (n == len) log_frame(c, frame, len);
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
// serves datagrams, streams and serial ports; framing needs no length
// prefix.

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

// Serial transport (the reference's MavLinkCom connectSerial,
// MavLinkCom/src/serial_com/SerialPort.cpp): open a tty in raw 8N1 mode at
// `baud`, receive via read() with a 100 ms VTIME poll so stop() is prompt.
// Works against real UARTs and pty pairs alike (the loopback tests drive a
// pty).  NULL on failure.
void* mav_conn_create_serial(const char* device, int baud, uint8_t sysid,
                             uint8_t compid) {
    int fd = open(device, O_RDWR | O_NOCTTY);
    if (fd < 0) return nullptr;
    termios tio{};
    if (tcgetattr(fd, &tio) != 0) {
        close(fd);
        return nullptr;
    }
    cfmakeraw(&tio);
    tio.c_cflag |= CLOCAL | CREAD;
    tio.c_cc[VMIN] = 0;
    tio.c_cc[VTIME] = 1;  // 100 ms read timeout -> prompt stop()
    speed_t sp = B115200;
    switch (baud) {
        case 9600: sp = B9600; break;
        case 57600: sp = B57600; break;
        case 115200: sp = B115200; break;
        case 230400: sp = B230400; break;
        case 460800: sp = B460800; break;
        case 921600: sp = B921600; break;
        default: break;  // keep 115200 for unknown rates
    }
    cfsetispeed(&tio, sp);
    cfsetospeed(&tio, sp);
    if (tcsetattr(fd, TCSANOW, &tio) != 0) {
        close(fd);
        return nullptr;
    }
    auto* c = new Conn();
    c->fd = fd;
    c->is_serial = true;
    c->sysid = sysid;
    c->compid = compid;
    c->parser = mavlink_parser_create();
    c->rx_thread = std::thread(rx_loop, c);
    return c;
}

void mav_conn_destroy(void* h) {
    auto* c = static_cast<Conn*>(h);
    c->stop.store(true);
    if (c->sched) scheduler_destroy(c->sched);  // joins TX tasks
    if (c->rx_thread.joinable()) c->rx_thread.join();
    mavlink_parser_destroy(c->parser);
    close(c->fd);
    {
        std::lock_guard<std::mutex> lock(c->log_mu);
        if (c->log_fp) fclose(c->log_fp);
        c->log_fp = nullptr;
    }
    delete c;
}

// ---- raw-frame subscribers + raw send (microservice plumbing) -------------

// Register cb for every CRC-valid incoming frame.  Returns a slot id >= 0,
// or -1 when all slots are taken.
int mav_conn_subscribe(void* h, mav_raw_cb cb, void* ctx) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->sub_mu);
    for (int s = 0; s < kMaxSubscribers; ++s) {
        if (!c->subs[s]) {
            c->subs[s] = cb;
            c->sub_ctx[s] = ctx;
            return s;
        }
    }
    return -1;
}

void mav_conn_unsubscribe(void* h, int slot) {
    auto* c = static_cast<Conn*>(h);
    if (slot < 0 || slot >= kMaxSubscribers) return;
    std::lock_guard<std::mutex> lock(c->sub_mu);
    c->subs[slot] = nullptr;
    c->sub_ctx[slot] = nullptr;
}

// Pack + send any message the codec's CRC_EXTRA table knows from its raw
// wire payload.  -1 on unknown msgid or short write.
int mav_conn_send_raw(void* h, uint32_t msgid, const uint8_t* payload,
                      int payload_len) {
    auto* c = static_cast<Conn*>(h);
    uint8_t frame[300];
    int len = mavlink2_pack_raw(msgid, payload,
                                static_cast<size_t>(payload_len),
                                c->seq.fetch_add(1), c->sysid, c->compid,
                                frame);
    if (len < 0) return -1;
    return send_frame(c, frame, len);
}

// ---- .tlog capture --------------------------------------------------------

// Start appending every frame (both directions) to `path` in tlog format:
// 8-byte big-endian epoch-microsecond timestamp + raw MAVLink v2 frame (the
// MavLinkFileLog::openForWriting role).  -1 if the file cannot be opened.
int mav_conn_log_open(void* h, const char* path) {
    auto* c = static_cast<Conn*>(h);
    FILE* fp = fopen(path, "wb");
    if (!fp) return -1;
    std::lock_guard<std::mutex> lock(c->log_mu);
    if (c->log_fp) fclose(c->log_fp);
    c->log_fp = fp;
    return 0;
}

void mav_conn_log_close(void* h) {
    auto* c = static_cast<Conn*>(h);
    std::lock_guard<std::mutex> lock(c->log_mu);
    if (c->log_fp) fclose(c->log_fp);
    c->log_fp = nullptr;
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

// ---- .tlog reader (MavLinkFileLog::openForReading / read role) ------------

namespace {
struct LogReader {
    FILE* fp = nullptr;
    void* parser = nullptr;
};
}  // namespace

void* mav_log_reader_open(const char* path) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return nullptr;
    auto* r = new LogReader();
    r->fp = fp;
    r->parser = mavlink_parser_create();
    return r;
}

// Read the next record.  Returns 1 and fills ts_us/msgid/payload/payload_len
// on success, 0 at EOF, -1 on a corrupt record (CRC / framing).
int mav_log_reader_next(void* h, uint64_t* ts_us, uint32_t* msgid,
                        uint8_t* payload, uint8_t* payload_len) {
    auto* r = static_cast<LogReader*>(h);
    uint8_t ts[8];
    if (fread(ts, 1, 8, r->fp) != 8) return 0;
    uint64_t us = 0;
    for (int i = 0; i < 8; ++i) us = (us << 8) | ts[i];
    *ts_us = us;
    // feed bytes until the parser completes one frame
    for (int guard = 0; guard < 4096; ++guard) {
        int b = fgetc(r->fp);
        if (b == EOF) return -1;  // truncated record
        int rr = mavlink_parser_feed_auto(r->parser,
                                          static_cast<uint8_t>(b), msgid,
                                          payload, payload_len);
        if (rr == 1) return 1;
        if (rr < 0) return -1;
    }
    return -1;
}

void mav_log_reader_close(void* h) {
    auto* r = static_cast<LogReader*>(h);
    fclose(r->fp);
    mavlink_parser_destroy(r->parser);
    delete r;
}

}  // extern "C"
