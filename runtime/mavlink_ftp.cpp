// MAVLink FTP microservice — server + client over FILE_TRANSFER_PROTOCOL
// (#110), the runtime's equivalent of the reference's MavLinkFtpClient
// (MavLinkCom/src/MavLinkFtpClient.cpp; surface per
// MavLinkCom/include/MavLinkFtpClient.hpp: list/get/put/remove/mkdir/rmdir)
// plus the vehicle-side responder the reference delegates to the autopilot.
//
// Wire format (MAVLink FTP spec): the #110 payload is target_network u8,
// target_system u8, target_component u8, then a 251-byte FTP payload:
//   seq u16 | session u8 | opcode u8 | size u8 | req_opcode u8 |
//   burst_complete u8 | padding u8 | offset u32 | data[<=239]
// Replies carry opcode ACK(128)/NAK(129), req_opcode = the request's opcode,
// seq = request seq + 1; NAK data[0] is the error code.
//
// The server roots all paths under a directory given at creation (leading
// '/' stripped, ".." rejected) and keeps one read/write session, mirroring
// the single-session use the reference client makes.  The client issues
// blocking ops with resend-on-timeout, matching replies via req_opcode AND
// seq (rep.seq == req.seq + 1) on the connection's subscriber hook
// (mavlink_conn.cpp), so delayed duplicates from earlier requests of the
// same opcode are discarded rather than corrupting the current transfer.

#include <dirent.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

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

constexpr uint32_t kFtpMsgId = 110;
constexpr int kHdr = 12;      // FTP payload header bytes
constexpr int kMaxData = 239; // FTP data bytes per packet
constexpr int kFtpLen = 3 + kHdr + kMaxData;  // full #110 payload

// opcodes
enum : uint8_t {
    kOpNone = 0,
    kOpTerminate = 1,
    kOpReset = 2,
    kOpList = 3,
    kOpOpenRO = 4,
    kOpRead = 5,
    kOpCreate = 6,
    kOpWrite = 7,
    kOpRemove = 8,
    kOpMkdir = 9,
    kOpRmdir = 10,
    kOpOpenWO = 11,
    kOpTruncate = 12,
    kOpRename = 13,
    kOpCalcCrc32 = 14,
    kOpBurstRead = 15,
    kOpAck = 128,
    kOpNak = 129,
};

// NAK error codes
enum : uint8_t {
    kErrFail = 1,
    kErrFailErrno = 2,
    kErrInvalidSession = 4,
    kErrEof = 6,
    kErrUnknown = 7,
    kErrExists = 8,
    kErrNotFound = 10,
};

struct FtpPacket {
    uint16_t seq = 0;
    uint8_t session = 0;
    uint8_t opcode = kOpNone;
    uint8_t size = 0;
    uint8_t req_opcode = kOpNone;
    uint8_t burst_complete = 0;
    uint32_t offset = 0;
    uint8_t data[kMaxData] = {0};
};

// decode a (possibly v2-truncated) #110 message payload
bool decode(const uint8_t* payload, uint8_t plen, FtpPacket* p) {
    uint8_t full[kFtpLen];
    std::memset(full, 0, sizeof(full));
    std::memcpy(full, payload, plen < sizeof(full) ? plen : sizeof(full));
    const uint8_t* f = full + 3;  // skip target_network/system/component
    std::memcpy(&p->seq, f + 0, 2);
    p->session = f[2];
    p->opcode = f[3];
    p->size = f[4];
    p->req_opcode = f[5];
    p->burst_complete = f[6];
    std::memcpy(&p->offset, f + 8, 4);
    if (p->size > kMaxData) return false;
    std::memcpy(p->data, f + kHdr, p->size);
    return true;
}

int send_pkt(void* conn, const FtpPacket& p) {
    uint8_t payload[kFtpLen];
    std::memset(payload, 0, sizeof(payload));
    // target_network/system/component: point-to-point link, broadcast 0s
    uint8_t* f = payload + 3;
    std::memcpy(f + 0, &p.seq, 2);
    f[2] = p.session;
    f[3] = p.opcode;
    f[4] = p.size;
    f[5] = p.req_opcode;
    f[6] = p.burst_complete;
    std::memcpy(f + 8, &p.offset, 4);
    std::memcpy(f + kHdr, p.data, p.size);
    return mav_conn_send_raw(conn, kFtpMsgId, payload, sizeof(payload));
}

// standard CRC-32 (poly 0xEDB88320, the MAVLink-FTP CalcFileCRC32 checksum)
uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
    crc = ~crc;
    for (size_t i = 0; i < len; ++i) {
        crc ^= buf[i];
        for (int k = 0; k < 8; ++k)
            crc = (crc >> 1) ^ (0xEDB88320u & (~(crc & 1) + 1));
    }
    return ~crc;
}

// ---------------------------------------------------------------------------
// server

struct FtpServer {
    void* conn = nullptr;
    int slot = -1;
    std::string root;
    std::mutex mu;
    FILE* fp = nullptr;  // the one open session
    uint64_t served_ops = 0;
};

// join root + remote path, rejecting escapes
bool resolve(FtpServer* s, const uint8_t* data, uint8_t size,
             std::string* out) {
    std::string rel(reinterpret_cast<const char*>(data),
                    strnlen(reinterpret_cast<const char*>(data), size));
    while (!rel.empty() && rel.front() == '/') rel.erase(0, 1);
    if (rel.find("..") != std::string::npos) return false;
    *out = s->root + "/" + rel;
    return true;
}

void reply_nak(FtpServer* s, const FtpPacket& req, uint8_t err) {
    FtpPacket r;
    r.seq = static_cast<uint16_t>(req.seq + 1);
    r.session = req.session;
    r.opcode = kOpNak;
    r.req_opcode = req.opcode;
    r.size = 1;
    r.data[0] = err;
    if (err == kErrFailErrno) {
        r.size = 2;
        r.data[1] = static_cast<uint8_t>(errno & 0xFF);
    }
    send_pkt(s->conn, r);
}

void server_handle(void* ctx, uint32_t msgid, const uint8_t* payload,
                   uint8_t plen) {
    if (msgid != kFtpMsgId) return;
    auto* s = static_cast<FtpServer*>(ctx);
    FtpPacket req;
    if (!decode(payload, plen, &req)) return;
    if (req.opcode >= kOpAck) return;  // a reply, not a request
    std::lock_guard<std::mutex> lock(s->mu);
    s->served_ops++;

    FtpPacket r;
    r.seq = static_cast<uint16_t>(req.seq + 1);
    r.session = req.session;
    r.opcode = kOpAck;
    r.req_opcode = req.opcode;
    std::string path;

    switch (req.opcode) {
        case kOpList: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            DIR* d = opendir(path.c_str());
            if (!d) return reply_nak(s, req, kErrNotFound);
            // entries are returned sorted by readdir order; `offset` skips.
            // idx counts only entries we can actually emit (stat-ok): the
            // client advances its offset per returned entry, so counting a
            // stat-failed entry here would make later pages skip or repeat.
            uint32_t idx = 0;
            int used = 0;
            dirent* e;
            while ((e = readdir(d)) != nullptr) {
                if (!std::strcmp(e->d_name, ".") ||
                    !std::strcmp(e->d_name, ".."))
                    continue;
                std::string full = path + "/" + e->d_name;
                struct stat st {};
                if (stat(full.c_str(), &st) != 0) continue;
                if (idx++ < req.offset) continue;
                char entry[300];
                int n;
                if (S_ISDIR(st.st_mode)) {
                    n = std::snprintf(entry, sizeof(entry), "D%s", e->d_name);
                } else {
                    n = std::snprintf(entry, sizeof(entry), "F%s\t%lld",
                                      e->d_name,
                                      static_cast<long long>(st.st_size));
                }
                if (used + n + 1 > kMaxData) break;
                std::memcpy(r.data + used, entry, static_cast<size_t>(n) + 1);
                used += n + 1;
            }
            closedir(d);
            if (used == 0) return reply_nak(s, req, kErrEof);
            r.size = static_cast<uint8_t>(used);
            break;
        }
        case kOpOpenRO: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (s->fp) fclose(s->fp);
            s->fp = fopen(path.c_str(), "rb");
            if (!s->fp) return reply_nak(s, req, kErrNotFound);
            struct stat st {};
            stat(path.c_str(), &st);
            uint32_t sz = static_cast<uint32_t>(st.st_size);
            r.size = 4;
            std::memcpy(r.data, &sz, 4);
            break;
        }
        case kOpRead: {
            if (!s->fp) return reply_nak(s, req, kErrInvalidSession);
            if (fseek(s->fp, static_cast<long>(req.offset), SEEK_SET) != 0)
                return reply_nak(s, req, kErrFailErrno);
            size_t want = req.size ? req.size : kMaxData;
            size_t n = fread(r.data, 1, want, s->fp);
            if (n == 0) return reply_nak(s, req, kErrEof);
            r.size = static_cast<uint8_t>(n);
            r.offset = req.offset;
            break;
        }
        case kOpCreate:
        case kOpOpenWO: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (s->fp) fclose(s->fp);
            s->fp = fopen(path.c_str(),
                          req.opcode == kOpCreate ? "wb" : "r+b");
            if (!s->fp && req.opcode == kOpOpenWO)
                s->fp = fopen(path.c_str(), "wb");
            if (!s->fp) return reply_nak(s, req, kErrFailErrno);
            break;
        }
        case kOpWrite: {
            if (!s->fp) return reply_nak(s, req, kErrInvalidSession);
            if (fseek(s->fp, static_cast<long>(req.offset), SEEK_SET) != 0)
                return reply_nak(s, req, kErrFailErrno);
            if (fwrite(req.data, 1, req.size, s->fp) != req.size)
                return reply_nak(s, req, kErrFailErrno);
            r.offset = req.offset;
            break;
        }
        case kOpTerminate:
        case kOpReset: {
            if (s->fp) {
                fclose(s->fp);
                s->fp = nullptr;
            }
            break;
        }
        case kOpRemove: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (unlink(path.c_str()) != 0)
                return reply_nak(s, req, kErrNotFound);
            break;
        }
        case kOpMkdir: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (mkdir(path.c_str(), 0755) != 0)
                return reply_nak(s, req,
                                 errno == EEXIST ? kErrExists : kErrFailErrno);
            break;
        }
        case kOpRmdir: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (rmdir(path.c_str()) != 0)
                return reply_nak(s, req, kErrFailErrno);
            break;
        }
        case kOpRename: {
            // data = "<from>\0<to>"
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            size_t n0 = strnlen(reinterpret_cast<const char*>(req.data),
                                req.size);
            if (n0 + 1 >= req.size) return reply_nak(s, req, kErrFail);
            std::string to;
            if (!resolve(s, req.data + n0 + 1,
                         static_cast<uint8_t>(req.size - n0 - 1), &to))
                return reply_nak(s, req, kErrFail);
            if (rename(path.c_str(), to.c_str()) != 0)
                return reply_nak(s, req, kErrFailErrno);
            break;
        }
        case kOpTruncate: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            if (truncate(path.c_str(), static_cast<off_t>(req.offset)) != 0)
                return reply_nak(s, req, kErrFailErrno);
            break;
        }
        case kOpCalcCrc32: {
            if (!resolve(s, req.data, req.size, &path))
                return reply_nak(s, req, kErrFail);
            FILE* fp = fopen(path.c_str(), "rb");
            if (!fp) return reply_nak(s, req, kErrNotFound);
            uint32_t crc = 0;
            uint8_t buf[4096];
            size_t n;
            while ((n = fread(buf, 1, sizeof(buf), fp)) > 0)
                crc = crc32_update(crc, buf, n);
            fclose(fp);
            r.size = 4;
            std::memcpy(r.data, &crc, 4);
            break;
        }
        default:
            return reply_nak(s, req, kErrUnknown);
    }
    send_pkt(s->conn, r);
}

// ---------------------------------------------------------------------------
// client

struct FtpClient {
    void* conn = nullptr;
    int slot = -1;
    uint16_t seq = 0;

    std::mutex mu;
    std::condition_variable cv;
    bool have_reply = false;
    FtpPacket reply;
};

void client_handle(void* ctx, uint32_t msgid, const uint8_t* payload,
                   uint8_t plen) {
    if (msgid != kFtpMsgId) return;
    auto* c = static_cast<FtpClient*>(ctx);
    FtpPacket p;
    if (!decode(payload, plen, &p)) return;
    if (p.opcode < kOpAck) return;  // a request, not a reply
    std::lock_guard<std::mutex> lock(c->mu);
    c->reply = p;
    c->have_reply = true;
    c->cv.notify_all();
}

// one round trip with resend-on-timeout; returns 0 and fills *out on ACK,
// the NAK error code (>0) on NAK, -1 on timeout
int transact(FtpClient* c, FtpPacket* req, FtpPacket* out, double timeout_s) {
    req->seq = c->seq;
    c->seq = static_cast<uint16_t>(c->seq + 2);
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::duration<double>(timeout_s);
    while (std::chrono::steady_clock::now() < deadline) {
        {
            std::lock_guard<std::mutex> lock(c->mu);
            c->have_reply = false;
        }
        send_pkt(c->conn, *req);
        std::unique_lock<std::mutex> lock(c->mu);
        // Match on seq, not just req_opcode: with resend-on-timeout a delayed
        // duplicate reply to a PREVIOUS request of the same opcode must not be
        // accepted for this one (it could carry another offset's data).  The
        // protocol gives us rep.seq == req.seq + 1; non-matching replies are
        // discarded by the predicate and we keep waiting.
        const uint16_t want_seq = static_cast<uint16_t>(req->seq + 1);
        if (c->cv.wait_for(lock, std::chrono::milliseconds(200), [&] {
                return c->have_reply &&
                       c->reply.req_opcode == req->opcode &&
                       c->reply.seq == want_seq;
            })) {
            *out = c->reply;
            if (out->opcode == kOpNak)
                return out->size >= 1 ? out->data[0]
                                      : static_cast<uint8_t>(kErrFail);
            return 0;
        }
        // timeout: resend (requests are idempotent at this layer)
    }
    return -1;
}

void set_path(FtpPacket* p, const char* path) {
    size_t n = std::strlen(path);
    if (n > kMaxData - 1) n = kMaxData - 1;
    std::memcpy(p->data, path, n);
    p->size = static_cast<uint8_t>(n);
}

}  // namespace

extern "C" {

// ---- server ---------------------------------------------------------------

// Serve MAVLink-FTP requests arriving on `conn`, rooted at directory `root`.
void* mav_ftp_server_create(void* conn, const char* root) {
    auto* s = new FtpServer();
    s->conn = conn;
    s->root = root;
    while (!s->root.empty() && s->root.back() == '/') s->root.pop_back();
    s->slot = mav_conn_subscribe(conn, server_handle, s);
    if (s->slot < 0) {
        delete s;
        return nullptr;
    }
    return s;
}

uint64_t mav_ftp_server_ops(void* h) {
    auto* s = static_cast<FtpServer*>(h);
    std::lock_guard<std::mutex> lock(s->mu);
    return s->served_ops;
}

void mav_ftp_server_destroy(void* h) {
    auto* s = static_cast<FtpServer*>(h);
    mav_conn_unsubscribe(s->conn, s->slot);
    std::lock_guard<std::mutex> lock(s->mu);
    if (s->fp) fclose(s->fp);
    delete s;
}

// ---- client ---------------------------------------------------------------

void* mav_ftp_client_create(void* conn) {
    auto* c = new FtpClient();
    c->conn = conn;
    c->slot = mav_conn_subscribe(conn, client_handle, c);
    if (c->slot < 0) {
        delete c;
        return nullptr;
    }
    return c;
}

void mav_ftp_client_destroy(void* h) {
    auto* c = static_cast<FtpClient*>(h);
    mav_conn_unsubscribe(c->conn, c->slot);
    delete c;
}

// List `path`; writes newline-separated entries ("D<name>" / "F<name>\t<size>")
// into out (NUL-terminated).  Returns the entry count, or <0 on error.
int mav_ftp_list(void* h, const char* path, char* out, int out_cap,
                 double timeout_s) {
    auto* c = static_cast<FtpClient*>(h);
    int count = 0, used = 0;
    if (out_cap > 0) out[0] = '\0';
    uint32_t offset = 0;
    while (true) {
        FtpPacket req, rep;
        req.opcode = kOpList;
        req.offset = offset;
        set_path(&req, path);
        int rc = transact(c, &req, &rep, timeout_s);
        if (rc == kErrEof) break;  // done
        if (rc != 0) return rc == -1 ? -1 : -rc;
        // parse NUL-separated entries
        int i = 0;
        while (i < rep.size) {
            const char* e = reinterpret_cast<const char*>(rep.data + i);
            int n = static_cast<int>(
                strnlen(e, static_cast<size_t>(rep.size - i)));
            if (n == 0) break;
            if (used + n + 2 < out_cap) {
                std::memcpy(out + used, e, static_cast<size_t>(n));
                used += n;
                out[used++] = '\n';
                out[used] = '\0';
            }
            count++;
            offset++;
            i += n + 1;
        }
    }
    return count;
}

// Download remote -> local.  Returns bytes transferred, or <0 on error.
long mav_ftp_get(void* h, const char* remote, const char* local,
                 double timeout_s) {
    auto* c = static_cast<FtpClient*>(h);
    FtpPacket req, rep;
    req.opcode = kOpOpenRO;
    set_path(&req, remote);
    int rc = transact(c, &req, &rep, timeout_s);
    if (rc != 0) return rc == -1 ? -1 : -rc;
    uint32_t fsize = 0;
    if (rep.size >= 4) std::memcpy(&fsize, rep.data, 4);

    FILE* fp = fopen(local, "wb");
    if (!fp) return -1;
    long got = 0;
    while (static_cast<uint32_t>(got) < fsize) {
        FtpPacket rreq, rrep;
        rreq.opcode = kOpRead;
        rreq.offset = static_cast<uint32_t>(got);
        rreq.size = kMaxData;
        rc = transact(c, &rreq, &rrep, timeout_s);
        if (rc == kErrEof) break;
        if (rc != 0) {
            fclose(fp);
            return rc == -1 ? -1 : -rc;
        }
        // Defensive: the seq match in transact() already pairs this reply to
        // this request, but a reply whose echoed offset disagrees with what we
        // asked for must never be appended at the wrong file position.
        if (rrep.offset != rreq.offset) {
            fclose(fp);
            return -1;
        }
        fwrite(rrep.data, 1, rrep.size, fp);
        got += rrep.size;
    }
    fclose(fp);
    FtpPacket treq, trep;
    treq.opcode = kOpTerminate;
    transact(c, &treq, &trep, timeout_s);
    return got;
}

// Upload local -> remote.  Returns bytes transferred, or <0 on error.
long mav_ftp_put(void* h, const char* local, const char* remote,
                 double timeout_s) {
    auto* c = static_cast<FtpClient*>(h);
    FILE* fp = fopen(local, "rb");
    if (!fp) return -1;
    FtpPacket req, rep;
    req.opcode = kOpCreate;
    set_path(&req, remote);
    int rc = transact(c, &req, &rep, timeout_s);
    if (rc != 0) {
        fclose(fp);
        return rc == -1 ? -1 : -rc;
    }
    long sent = 0;
    while (true) {
        uint8_t buf[kMaxData];
        size_t n = fread(buf, 1, sizeof(buf), fp);
        if (n == 0) break;
        FtpPacket wreq, wrep;
        wreq.opcode = kOpWrite;
        wreq.offset = static_cast<uint32_t>(sent);
        wreq.size = static_cast<uint8_t>(n);
        std::memcpy(wreq.data, buf, n);
        rc = transact(c, &wreq, &wrep, timeout_s);
        if (rc != 0) {
            fclose(fp);
            return rc == -1 ? -1 : -rc;
        }
        sent += static_cast<long>(n);
    }
    fclose(fp);
    FtpPacket treq, trep;
    treq.opcode = kOpTerminate;
    transact(c, &treq, &trep, timeout_s);
    return sent;
}

// single-round-trip ops; 0 on success, NAK error (>0), -1 on timeout
static int simple_op(void* h, uint8_t opcode, const char* path,
                     double timeout_s) {
    auto* c = static_cast<FtpClient*>(h);
    FtpPacket req, rep;
    req.opcode = opcode;
    set_path(&req, path);
    int rc = transact(c, &req, &rep, timeout_s);
    return rc;
}

int mav_ftp_remove(void* h, const char* path, double timeout_s) {
    return simple_op(h, kOpRemove, path, timeout_s);
}

int mav_ftp_mkdir(void* h, const char* path, double timeout_s) {
    return simple_op(h, kOpMkdir, path, timeout_s);
}

int mav_ftp_rmdir(void* h, const char* path, double timeout_s) {
    return simple_op(h, kOpRmdir, path, timeout_s);
}

// CRC-32 of the remote file into *crc_out; 0 on success.
int mav_ftp_crc32(void* h, const char* path, uint32_t* crc_out,
                  double timeout_s) {
    auto* c = static_cast<FtpClient*>(h);
    FtpPacket req, rep;
    req.opcode = kOpCalcCrc32;
    set_path(&req, path);
    int rc = transact(c, &req, &rep, timeout_s);
    if (rc == 0 && rep.size >= 4) std::memcpy(crc_out, rep.data, 4);
    return rc;
}

}  // extern "C"
