// Minimal MAVLink v2 framing codec — the protocol core of a real-vehicle
// bridge (the role MavLinkCom plays in the reference for Betaflight/PX4
// transport; its FTP/log/param machinery is hardware-ops scope and omitted).
//
// Implements: v2 frame pack with trailing-zero payload truncation, the X.25
// (CRC-16/MCRF4XX) checksum with per-message CRC_EXTRA, an incremental
// byte-stream parser, and a typed packer for SET_ATTITUDE_TARGET (#82) —
// the one message the reference pipeline actually flies on
// (mavros /setpoint_raw/attitude -> attitude+thrust).
//
// Written from the MAVLink v2 wire-format specification; no generated code.

#include <cstdint>
#include <cstring>

namespace {

constexpr uint8_t kMagicV2 = 0xFD;
constexpr size_t kHeaderLen = 10;  // magic..msgid[2]
constexpr size_t kCrcLen = 2;

inline void crc_accumulate(uint8_t b, uint16_t* crc) {
    uint8_t tmp = b ^ static_cast<uint8_t>(*crc & 0xFF);
    tmp ^= static_cast<uint8_t>(tmp << 4);
    *crc = static_cast<uint16_t>((*crc >> 8) ^ (tmp << 8) ^ (tmp << 3) ^ (tmp >> 4));
}

struct Parser {
    enum State { kIdle, kGotMagic, kInFrame } state = kIdle;
    uint8_t buf[300];
    size_t have = 0;
    size_t need = 0;
};

}  // namespace

extern "C" {

uint16_t mavlink_crc(const uint8_t* data, size_t len, uint8_t crc_extra) {
    uint16_t crc = 0xFFFF;
    for (size_t i = 0; i < len; ++i) crc_accumulate(data[i], &crc);
    crc_accumulate(crc_extra, &crc);
    return crc;
}

// Pack one MAVLink v2 frame. Returns total frame length written to `out`
// (caller provides >= 12 + payload_len bytes). Trailing zero bytes of the
// payload are truncated per the v2 spec (at least 1 byte remains).
int mavlink2_pack(uint32_t msgid, const uint8_t* payload, size_t payload_len,
                  uint8_t seq, uint8_t sysid, uint8_t compid,
                  uint8_t crc_extra, uint8_t* out) {
    size_t plen = payload_len;
    while (plen > 1 && payload[plen - 1] == 0) --plen;
    out[0] = kMagicV2;
    out[1] = static_cast<uint8_t>(plen);
    out[2] = 0;  // incompat flags
    out[3] = 0;  // compat flags
    out[4] = seq;
    out[5] = sysid;
    out[6] = compid;
    out[7] = static_cast<uint8_t>(msgid & 0xFF);
    out[8] = static_cast<uint8_t>((msgid >> 8) & 0xFF);
    out[9] = static_cast<uint8_t>((msgid >> 16) & 0xFF);
    if (plen) std::memcpy(out + kHeaderLen, payload, plen);
    uint16_t crc = mavlink_crc(out + 1, kHeaderLen - 1 + plen, crc_extra);
    out[kHeaderLen + plen] = static_cast<uint8_t>(crc & 0xFF);
    out[kHeaderLen + plen + 1] = static_cast<uint8_t>(crc >> 8);
    return static_cast<int>(kHeaderLen + plen + kCrcLen);
}

void* mavlink_parser_create() { return new Parser(); }
void mavlink_parser_destroy(void* p) { delete static_cast<Parser*>(p); }

// Feed one byte. Returns 1 when a complete, CRC-valid frame is available
// (fills msgid/payload/payload_len), 0 otherwise, -1 on CRC failure.
// `crc_extra` must be the CRC_EXTRA of the (expected) message id; pass the
// table value for the ids you handle.
int mavlink_parser_feed(void* pp, uint8_t byte, uint8_t crc_extra,
                        uint32_t* msgid, uint8_t* payload,
                        uint8_t* payload_len) {
    auto* p = static_cast<Parser*>(pp);
    switch (p->state) {
        case Parser::kIdle:
            if (byte == kMagicV2) {
                p->buf[0] = byte;
                p->have = 1;
                p->state = Parser::kGotMagic;
            }
            return 0;
        case Parser::kGotMagic:
            p->buf[1] = byte;  // payload length
            p->have = 2;
            p->need = kHeaderLen + byte + kCrcLen;
            p->state = Parser::kInFrame;
            return 0;
        case Parser::kInFrame:
            p->buf[p->have++] = byte;
            if (p->have < p->need) return 0;
            p->state = Parser::kIdle;
            {
                size_t plen = p->buf[1];
                uint16_t crc = mavlink_crc(p->buf + 1, kHeaderLen - 1 + plen, crc_extra);
                uint16_t got = static_cast<uint16_t>(
                    p->buf[kHeaderLen + plen] |
                    (p->buf[kHeaderLen + plen + 1] << 8));
                if (crc != got) return -1;
                *msgid = static_cast<uint32_t>(p->buf[7]) |
                         (static_cast<uint32_t>(p->buf[8]) << 8) |
                         (static_cast<uint32_t>(p->buf[9]) << 16);
                *payload_len = static_cast<uint8_t>(plen);
                if (plen) std::memcpy(payload, p->buf + kHeaderLen, plen);
            }
            return 1;
    }
    return 0;
}

// CRC_EXTRA table for the message ids this runtime speaks (values from the
// MAVLink common.xml message definitions).  Returns -1 for unknown ids.
int mavlink_crc_extra_for(uint32_t msgid) {
    switch (msgid) {
        case 0: return 50;    // HEARTBEAT
        case 22: return 220;  // PARAM_VALUE
        case 23: return 168;  // PARAM_SET
        case 30: return 39;   // ATTITUDE
        case 32: return 185;  // LOCAL_POSITION_NED
        case 76: return 152;  // COMMAND_LONG
        case 82: return 49;   // SET_ATTITUDE_TARGET
        case 110: return 84;  // FILE_TRANSFER_PROTOCOL
        case 130: return 29;  // DATA_TRANSMISSION_HANDSHAKE
        case 131: return 223; // ENCAPSULATED_DATA
        default: return -1;
    }
}

// Pack any message whose CRC_EXTRA the table above knows, from its raw wire
// payload — the generic entry the FTP / video microservices use (their
// payloads are built by the service layer).  Returns -1 on unknown msgid.
int mavlink2_pack_raw(uint32_t msgid, const uint8_t* payload,
                      size_t payload_len, uint8_t seq, uint8_t sysid,
                      uint8_t compid, uint8_t* out) {
    int extra = mavlink_crc_extra_for(msgid);
    if (extra < 0) return -1;
    return mavlink2_pack(msgid, payload, payload_len, seq, sysid, compid,
                         static_cast<uint8_t>(extra), out);
}

// After mavlink_parser_feed / _feed_auto returns 1, the full raw frame (as
// received on the wire, header + payload + CRC) is available here until the
// next byte is fed — what the connection log writes (reference:
// MavLinkFileLog::write persisting each message, MavLinkLog.cpp).
int mavlink_parser_last_frame(void* pp, const uint8_t** frame) {
    auto* p = static_cast<Parser*>(pp);
    *frame = p->buf;
    return static_cast<int>(p->need);
}

// Like mavlink_parser_feed, but looks the CRC_EXTRA up from the parsed
// header's msgid — the form a mixed-message receive stream needs (a vehicle
// link interleaves HEARTBEAT/ATTITUDE/LOCAL_POSITION_NED).  Returns 1 on a
// complete valid frame, 0 mid-frame, -1 on CRC failure, -2 on an unknown
// msgid (frame discarded; parser resynchronizes on the next magic).
int mavlink_parser_feed_auto(void* pp, uint8_t byte, uint32_t* msgid,
                             uint8_t* payload, uint8_t* payload_len) {
    auto* p = static_cast<Parser*>(pp);
    switch (p->state) {
        case Parser::kIdle:
            if (byte == kMagicV2) {
                p->buf[0] = byte;
                p->have = 1;
                p->state = Parser::kGotMagic;
            }
            return 0;
        case Parser::kGotMagic:
            p->buf[1] = byte;
            p->have = 2;
            p->need = kHeaderLen + byte + kCrcLen;
            p->state = Parser::kInFrame;
            return 0;
        case Parser::kInFrame:
            p->buf[p->have++] = byte;
            if (p->have < p->need) return 0;
            p->state = Parser::kIdle;
            {
                size_t plen = p->buf[1];
                uint32_t id = static_cast<uint32_t>(p->buf[7]) |
                              (static_cast<uint32_t>(p->buf[8]) << 8) |
                              (static_cast<uint32_t>(p->buf[9]) << 16);
                int extra = mavlink_crc_extra_for(id);
                if (extra < 0) return -2;
                uint16_t crc = mavlink_crc(p->buf + 1, kHeaderLen - 1 + plen,
                                           static_cast<uint8_t>(extra));
                uint16_t got = static_cast<uint16_t>(
                    p->buf[kHeaderLen + plen] |
                    (p->buf[kHeaderLen + plen + 1] << 8));
                if (crc != got) return -1;
                *msgid = id;
                *payload_len = static_cast<uint8_t>(plen);
                if (plen) std::memcpy(payload, p->buf + kHeaderLen, plen);
            }
            return 1;
    }
    return 0;
}

// SET_ATTITUDE_TARGET (#82), CRC_EXTRA = 49. Field order per spec (sorted by
// size): time_boot_ms u32, q[4] f32, roll/pitch/yaw rates f32, thrust f32,
// target_system u8, target_component u8, type_mask u8 -> 39 bytes.
int mavlink2_pack_set_attitude_target(
    uint32_t time_boot_ms, const float q[4], float roll_rate, float pitch_rate,
    float yaw_rate, float thrust, uint8_t target_system,
    uint8_t target_component, uint8_t type_mask, uint8_t seq, uint8_t sysid,
    uint8_t compid, uint8_t* out) {
    uint8_t payload[39];
    std::memcpy(payload + 0, &time_boot_ms, 4);
    std::memcpy(payload + 4, q, 16);
    std::memcpy(payload + 20, &roll_rate, 4);
    std::memcpy(payload + 24, &pitch_rate, 4);
    std::memcpy(payload + 28, &yaw_rate, 4);
    std::memcpy(payload + 32, &thrust, 4);
    payload[36] = target_system;
    payload[37] = target_component;
    payload[38] = type_mask;
    return mavlink2_pack(82, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/49, out);
}

// HEARTBEAT (#0), CRC_EXTRA = 50 — the liveness beacon every MAVLink
// endpoint emits at 1 Hz; its absence is the link-loss failsafe trigger
// (the role MavLinkConnection's heartbeat thread plays in the reference's
// MavLinkCom). Field order per spec: custom_mode u32, type u8, autopilot
// u8, base_mode u8, system_status u8, mavlink_version u8 -> 9 bytes.
int mavlink2_pack_heartbeat(uint32_t custom_mode, uint8_t type,
                            uint8_t autopilot, uint8_t base_mode,
                            uint8_t system_status, uint8_t seq, uint8_t sysid,
                            uint8_t compid, uint8_t* out) {
    uint8_t payload[9];
    std::memcpy(payload + 0, &custom_mode, 4);
    payload[4] = type;
    payload[5] = autopilot;
    payload[6] = base_mode;
    payload[7] = system_status;
    payload[8] = 3;  // MAVLINK_VERSION
    return mavlink2_pack(0, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/50, out);
}

// COMMAND_LONG (#76), CRC_EXTRA = 152 — arm/disarm, mode changes, takeoff
// (MAV_CMD_COMPONENT_ARM_DISARM etc.; what MavLinkVehicle::armDisarm and
// friends send). Field order: param1..param7 f32, command u16,
// target_system u8, target_component u8, confirmation u8 -> 33 bytes.
int mavlink2_pack_command_long(const float params7[7], uint16_t command,
                               uint8_t target_system, uint8_t target_component,
                               uint8_t confirmation, uint8_t seq, uint8_t sysid,
                               uint8_t compid, uint8_t* out) {
    uint8_t payload[33];
    std::memcpy(payload + 0, params7, 28);
    std::memcpy(payload + 28, &command, 2);
    payload[30] = target_system;
    payload[31] = target_component;
    payload[32] = confirmation;
    return mavlink2_pack(76, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/152, out);
}

// ATTITUDE (#30), CRC_EXTRA = 39 — the vehicle's attitude telemetry (what
// the reference's input adapter consumes for orientation on a real vehicle,
// betaflight_ctrl/src/input.cpp odometry path).  Wire order: time_boot_ms
// u32, roll/pitch/yaw f32, rollspeed/pitchspeed/yawspeed f32 -> 28 bytes.
int mavlink2_pack_attitude(uint32_t time_boot_ms, const float rpy[3],
                           const float rates[3], uint8_t seq, uint8_t sysid,
                           uint8_t compid, uint8_t* out) {
    uint8_t payload[28];
    std::memcpy(payload + 0, &time_boot_ms, 4);
    std::memcpy(payload + 4, rpy, 12);
    std::memcpy(payload + 16, rates, 12);
    return mavlink2_pack(30, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/39, out);
}

// LOCAL_POSITION_NED (#32), CRC_EXTRA = 185 — the vehicle's local odometry
// (position + velocity in NED), the other half of the incoming state the
// home-frame latch and staleness gates feed on.  Wire order: time_boot_ms
// u32, x/y/z f32, vx/vy/vz f32 -> 28 bytes.
int mavlink2_pack_local_position_ned(uint32_t time_boot_ms, const float xyz[3],
                                     const float vxyz[3], uint8_t seq,
                                     uint8_t sysid, uint8_t compid,
                                     uint8_t* out) {
    uint8_t payload[28];
    std::memcpy(payload + 0, &time_boot_ms, 4);
    std::memcpy(payload + 4, xyz, 12);
    std::memcpy(payload + 16, vxyz, 12);
    return mavlink2_pack(32, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/185, out);
}

// PARAM_SET (#23), CRC_EXTRA = 168 — write one onboard parameter (the
// MavLinkParameter setter surface in the reference's MavLinkCom; bfctrl
// gains and hover_percentage travel this way on a real vehicle). Wire
// order (size-sorted): param_value f32, target_system u8,
// target_component u8, param_id char[16] (NUL-padded), param_type u8
// -> 23 bytes.
int mavlink2_pack_param_set(float param_value, const char* param_id,
                            uint8_t param_type, uint8_t target_system,
                            uint8_t target_component, uint8_t seq,
                            uint8_t sysid, uint8_t compid, uint8_t* out) {
    uint8_t payload[23] = {0};
    std::memcpy(payload + 0, &param_value, 4);
    payload[4] = target_system;
    payload[5] = target_component;
    std::strncpy(reinterpret_cast<char*>(payload + 6), param_id, 16);
    payload[22] = param_type;
    return mavlink2_pack(23, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/168, out);
}

// PARAM_VALUE (#22), CRC_EXTRA = 220 — the vehicle's reply/broadcast for a
// parameter (what param reads and PARAM_SET acks come back as). Wire order:
// param_value f32, param_count u16, param_index u16, param_id char[16],
// param_type u8 -> 25 bytes.
int mavlink2_pack_param_value(float param_value, uint16_t param_count,
                              uint16_t param_index, const char* param_id,
                              uint8_t param_type, uint8_t seq, uint8_t sysid,
                              uint8_t compid, uint8_t* out) {
    uint8_t payload[25] = {0};
    std::memcpy(payload + 0, &param_value, 4);
    std::memcpy(payload + 4, &param_count, 2);
    std::memcpy(payload + 6, &param_index, 2);
    std::strncpy(reinterpret_cast<char*>(payload + 8), param_id, 16);
    payload[24] = param_type;
    return mavlink2_pack(22, payload, sizeof(payload), seq, sysid, compid,
                         /*crc_extra=*/220, out);
}

}  // extern "C"
