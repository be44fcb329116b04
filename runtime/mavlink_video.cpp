// MAVLink video-stream microservice — client + server over
// DATA_TRANSMISSION_HANDSHAKE (#130) / ENCAPSULATED_DATA (#131), the
// runtime's equivalent of the reference's MavLinkVideoStream
// (MavLinkCom/src/impl/MavLinkVideoStreamImpl.cpp; surface per
// MavLinkCom/include/MavLinkVideoStream.hpp: MavLinkVideoClient
// requestVideo/readNextFrame, MavLinkVideoServer hasVideoRequest/sendFrame).
//
// Protocol: the client asks for video with COMMAND_LONG (#76)
// MAV_CMD_DO_CONTROL_VIDEO (=200; param1 camera id, param2 interval s,
// param3 record-locally).  The server answers each frame with one #130
// handshake (size/width/height/packet count/payload stride/type/quality)
// followed by ceil(size/253) #131 packets of 253 payload bytes, zero-padded
// at the tail.  The client reassembles by seqnr*stride offset and exposes
// the newest complete frame exactly once, plus an assembly-progress
// fraction while packets are in flight — all exactly the reference's state
// machine (MavLinkVideoStreamImpl.cpp:26-105,156-189).
//
// Wire payload layouts (MAVLink v2 sorts fields by size; v2 truncates
// trailing zero bytes, so decode zero-pads before reading):
//   #130: size u32 | width u16 | height u16 | packets u16 | type u8 |
//         payload u8 | jpg_quality u8                         (13 bytes)
//   #131: seqnr u16 | data u8[253]                            (255 bytes)
//   #76:  param1..7 f32 | command u16 | target_sys u8 | target_comp u8 |
//         confirmation u8                                     (33 bytes)

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

// ---- connection layer (mavlink_conn.cpp) ----
typedef void (*mav_raw_cb)(void* ctx, uint32_t msgid, const uint8_t* payload,
                           uint8_t payload_len);
extern "C" {
int mav_conn_subscribe(void* h, mav_raw_cb cb, void* ctx);
void mav_conn_unsubscribe(void* h, int slot);
int mav_conn_send_raw(void* h, uint32_t msgid, const uint8_t* payload,
                      int payload_len);
}

namespace {

constexpr uint32_t kMsgCommandLong = 76;
constexpr uint32_t kMsgHandshake = 130;
constexpr uint32_t kMsgEncapsulated = 131;
constexpr uint16_t kCmdDoControlVideo = 200;  // MAV_CMD_DO_CONTROL_VIDEO
constexpr int kPacketPayload = 253;  // #131 data[] size, fixed by the spec

// zero-pad a (possibly v2-truncated) payload to its full wire length
void pad(const uint8_t* in, uint8_t in_len, uint8_t* out, int full) {
    std::memset(out, 0, static_cast<size_t>(full));
    std::memcpy(out, in, in_len < full ? in_len : full);
}

template <typename T>
T rd(const uint8_t* p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    return v;
}

// ---- server ----------------------------------------------------------------

struct VideoServer {
    void* conn = nullptr;
    int slot = -1;
    std::mutex mu;
    // latest DO_CONTROL_VIDEO request (MavLinkVideoServer::MavLinkVideoRequest)
    int camera_id = 0;
    float every_n_sec = 0.0f;
    bool save_locally = false;
    bool valid = false;
};

void server_handle(void* ctx, uint32_t msgid, const uint8_t* payload,
                   uint8_t plen) {
    if (msgid != kMsgCommandLong) return;
    uint8_t full[33];
    pad(payload, plen, full, sizeof(full));
    if (rd<uint16_t>(full + 28) != kCmdDoControlVideo) return;
    auto* s = static_cast<VideoServer*>(ctx);
    std::lock_guard<std::mutex> lock(s->mu);
    // MAVLink spec field map: param1 id, param2 transmission, param3
    // interval, param4 recording — matching what requestVideo sends.
    // (Documented divergence: the reference's *server* reads param2/param3
    // as interval/recording, MavLinkVideoStreamImpl.cpp:129-132,
    // mismatching its own client at :96-105; we follow the spec + client.)
    s->camera_id = static_cast<int>(rd<float>(full + 0));
    s->every_n_sec = rd<float>(full + 8);
    s->save_locally = rd<float>(full + 12) != 0.0f;
    s->valid = true;
}

// ---- client ----------------------------------------------------------------

struct VideoClient {
    void* conn = nullptr;
    int slot = -1;
    std::mutex mu;
    // frame under assembly (MavLinkVideoClientImpl::incoming_image)
    std::vector<uint8_t> assembling;
    uint32_t size = 0;
    uint16_t packets = 0, arrived = 0, width = 0, height = 0;
    uint8_t stride = 0, type = 0, quality = 0;
    // newest complete frame, handed out once by read_frame
    std::vector<uint8_t> ready;
    uint16_t ready_w = 0, ready_h = 0;
    uint8_t ready_type = 0, ready_quality = 0;
    bool fresh = false;
};

void client_handle(void* ctx, uint32_t msgid, const uint8_t* payload,
                   uint8_t plen) {
    auto* c = static_cast<VideoClient*>(ctx);
    if (msgid == kMsgHandshake) {
        uint8_t full[13];
        pad(payload, plen, full, sizeof(full));
        std::lock_guard<std::mutex> lock(c->mu);
        c->size = rd<uint32_t>(full + 0);
        c->width = rd<uint16_t>(full + 4);
        c->height = rd<uint16_t>(full + 6);
        c->packets = rd<uint16_t>(full + 8);
        c->type = full[10];
        c->stride = full[11];
        c->quality = full[12];
        c->arrived = 0;
        c->assembling.assign(c->size, 0);
    } else if (msgid == kMsgEncapsulated) {
        uint8_t full[2 + kPacketPayload];
        pad(payload, plen, full, sizeof(full));
        std::lock_guard<std::mutex> lock(c->mu);
        // no handshake seen (or transaction already completed): drop, as the
        // reference does on a zero-packet transaction
        if (c->packets == 0 || c->stride == 0) return;
        uint32_t pos = rd<uint16_t>(full + 0) * static_cast<uint32_t>(c->stride);
        for (int i = 0; i < c->stride && pos < c->size; ++i, ++pos)
            c->assembling[pos] = full[2 + i];
        if (++c->arrived >= c->packets) {
            c->ready.swap(c->assembling);
            c->ready_w = c->width;
            c->ready_h = c->height;
            c->ready_type = c->type;
            c->ready_quality = c->quality;
            c->fresh = true;
            c->packets = 0;  // restart the state machine
            c->arrived = 0;
        }
    }
}

}  // namespace

extern "C" {

// ---- server ----------------------------------------------------------------

void* mav_video_server_create(void* conn) {
    auto* s = new VideoServer();
    s->conn = conn;
    s->slot = mav_conn_subscribe(conn, server_handle, s);
    if (s->slot < 0) {
        delete s;
        return nullptr;
    }
    return s;
}

// Poll for a pending DO_CONTROL_VIDEO request; 1 if one was pending (and
// consumed), 0 otherwise (MavLinkVideoServer::hasVideoRequest).
int mav_video_server_has_request(void* h, int* camera_id, float* every_n_sec,
                                 int* save_locally) {
    auto* s = static_cast<VideoServer*>(h);
    std::lock_guard<std::mutex> lock(s->mu);
    if (!s->valid) return 0;
    *camera_id = s->camera_id;
    *every_n_sec = s->every_n_sec;
    *save_locally = s->save_locally ? 1 : 0;
    s->valid = false;
    return 1;
}

// Send one frame: #130 handshake + ceil(size/253) #131 packets.  Returns the
// packet count sent (>=1), or -1 on a send failure.
int mav_video_server_send_frame(void* h, const uint8_t* data, uint32_t size,
                                uint16_t width, uint16_t height, uint8_t type,
                                uint8_t quality) {
    auto* s = static_cast<VideoServer*>(h);
    uint16_t packets =
        static_cast<uint16_t>((size + kPacketPayload - 1) / kPacketPayload);
    uint8_t hs[13];
    std::memcpy(hs + 0, &size, 4);
    std::memcpy(hs + 4, &width, 2);
    std::memcpy(hs + 6, &height, 2);
    std::memcpy(hs + 8, &packets, 2);
    hs[10] = type;
    hs[11] = static_cast<uint8_t>(kPacketPayload);
    hs[12] = quality;
    if (mav_conn_send_raw(s->conn, kMsgHandshake, hs, sizeof(hs)) < 0)
        return -1;
    uint8_t pkt[2 + kPacketPayload];
    uint32_t byte = 0;
    for (uint16_t i = 0; i < packets; ++i) {
        std::memcpy(pkt + 0, &i, 2);
        for (int j = 0; j < kPacketPayload; ++j, ++byte)
            pkt[2 + j] = byte < size ? data[byte] : 0;
        if (mav_conn_send_raw(s->conn, kMsgEncapsulated, pkt, sizeof(pkt)) < 0)
            return -1;
    }
    return 1 + packets;
}

void mav_video_server_destroy(void* h) {
    auto* s = static_cast<VideoServer*>(h);
    mav_conn_unsubscribe(s->conn, s->slot);
    delete s;
}

// ---- client ----------------------------------------------------------------

void* mav_video_client_create(void* conn) {
    auto* c = new VideoClient();
    c->conn = conn;
    c->slot = mav_conn_subscribe(conn, client_handle, c);
    if (c->slot < 0) {
        delete c;
        return nullptr;
    }
    return c;
}

// COMMAND_LONG MAV_CMD_DO_CONTROL_VIDEO, transmission on
// (MavLinkVideoClientImpl::requestVideo).  Returns 0, or -1 on send failure.
int mav_video_client_request(void* h, int camera_id, float every_n_sec,
                             int save_locally, uint8_t target_system,
                             uint8_t target_component) {
    auto* c = static_cast<VideoClient*>(h);
    float params[7] = {static_cast<float>(camera_id), 1.0f, every_n_sec,
                       save_locally ? 1.0f : 0.0f, 0.0f, 0.0f, 0.0f};
    // reference field mapping: Id, Transmission, Interval, Recording
    uint8_t payload[33];
    std::memcpy(payload + 0, params, 28);
    uint16_t cmd = kCmdDoControlVideo;
    std::memcpy(payload + 28, &cmd, 2);
    payload[30] = target_system;
    payload[31] = target_component;
    payload[32] = 0;  // confirmation
    return mav_conn_send_raw(c->conn, kMsgCommandLong, payload,
                             sizeof(payload)) < 0
               ? -1
               : 0;
}

// Hand out the newest complete frame once.  Returns the frame size in bytes
// (copied into out), 0 if no new frame yet (progress then holds the
// in-flight assembly fraction, 0..1), or -1 if out_cap is too small (the
// frame stays pending).
int mav_video_client_read_frame(void* h, uint8_t* out, int out_cap,
                                int* width, int* height, int* type,
                                int* quality, float* progress) {
    auto* c = static_cast<VideoClient*>(h);
    std::lock_guard<std::mutex> lock(c->mu);
    if (!c->fresh) {
        *progress = c->packets
                        ? static_cast<float>(c->arrived) /
                              static_cast<float>(c->packets)
                        : 0.0f;
        return 0;
    }
    if (static_cast<int>(c->ready.size()) > out_cap) {
        *progress = 1.0f;  // complete frame pending, caller's buffer too small
        return -1;
    }
    std::memcpy(out, c->ready.data(), c->ready.size());
    *width = c->ready_w;
    *height = c->ready_h;
    *type = c->ready_type;
    *quality = c->ready_quality;
    *progress = 1.0f;
    c->fresh = false;
    return static_cast<int>(c->ready.size());
}

void mav_video_client_destroy(void* h) {
    auto* c = static_cast<VideoClient*>(h);
    mav_conn_unsubscribe(c->conn, c->slot);
    delete c;
}

}  // extern "C"
