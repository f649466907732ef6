// Native FASTA/FASTQ loader for dashing_tpu.
//
// The reference's sequence layer is C (klib kseq over gzFile; see reference
// Makefile:58-65 and src/sketch_and_cmp.h:565-570).  This is its TPU-host
// equivalent: parse a (possibly gzip-compressed) FASTA/FASTQ file into ONE
// contiguous byte buffer with records joined by `sep_len` zero bytes —
// exactly the layout dashing_tpu.ops.encode.join_records produces — plus a
// newline-joined name table.  Zero bytes are invalid bases, so k-mer windows
// never span records.
//
// Build:  make -C native     (g++ -O3 -shared -fPIC, links zlib)
// Python: dashing_tpu/io/native.py (ctypes, numpy zero-copy views).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>
#ifdef DTPU_HAVE_ZSTD
#include <zstd.h>
#endif

extern "C" {

struct DtpuFastx {
    uint8_t *seq;        // joined sequence bytes (malloc'd)
    uint64_t seq_len;
    char *names;         // '\n'-joined record names (malloc'd)
    uint64_t names_len;
    uint64_t nrecords;
    uint64_t *rec_ends;  // exclusive end offset of each record in `seq`
};

// zstd is wrapped transparently like the reference's zlibWrapper
// (reference Makefile:58-62, -DZWRAP_USE_ZSTD=1): sniff the frame magic
// and stream-decompress; builds without libzstd return -7 so the Python
// fallback engages instead of mis-parsing compressed bytes.
static int read_zstd(const char *path, std::vector<uint8_t> &out) {
#ifdef DTPU_HAVE_ZSTD
    std::FILE *fp = std::fopen(path, "rb");
    if (!fp) return -1;
    ZSTD_DStream *ds = ZSTD_createDStream();
    if (!ds) { std::fclose(fp); return -2; }
    std::vector<uint8_t> inbuf(ZSTD_DStreamInSize());
    std::vector<uint8_t> outbuf(ZSTD_DStreamOutSize());
    out.clear();
    int rc = 0;
    size_t last = 0;   // last ZSTD_decompressStream hint: 0 = frame done
    for (;;) {
        size_t got = std::fread(inbuf.data(), 1, inbuf.size(), fp);
        if (got == 0) break;
        ZSTD_inBuffer zin{inbuf.data(), got, 0};
        while (zin.pos < zin.size) {
            ZSTD_outBuffer zout{outbuf.data(), outbuf.size(), 0};
            last = ZSTD_decompressStream(ds, &zout, &zin);
            if (ZSTD_isError(last)) { rc = -2; goto done; }
            out.insert(out.end(), outbuf.data(), outbuf.data() + zout.pos);
        }
        if (got < inbuf.size()) break;
    }
    // EOF mid-frame = truncated input: silently returning the partial
    // bytes would parse as a valid-but-shorter FASTA and skew sketches
    if (last != 0) rc = -2;
done:
    ZSTD_freeDStream(ds);
    std::fclose(fp);
    return rc;
#else
    (void)path; (void)out;
    return -7;
#endif
}

static int read_all(const char *path, std::vector<uint8_t> &data) {
    {   // zstd frame? (zlib cannot; mirror the reference's zstd wrapping)
        std::FILE *fp = std::fopen(path, "rb");
        if (!fp) return -1;
        unsigned char head[4] = {0, 0, 0, 0};
        size_t n = std::fread(head, 1, 4, fp);
        std::fclose(fp);
        if (n == 4 && head[0] == 0x28 && head[1] == 0xb5 && head[2] == 0x2f
            && head[3] == 0xfd)
            return read_zstd(path, data);
    }
    gzFile fp = gzopen(path, "rb");  // reads plain files transparently too
    if (!fp) return -1;
    gzbuffer(fp, 1 << 20);
    const size_t CHUNK = 1 << 22;
    size_t used = 0;
    for (;;) {
        // grow geometrically: fixed-step resize realloc-copied the whole
        // buffer every 4 MB (O(n^2) memcpy — measured slower than the
        // Python parser on a 210 MB FASTQ)
        if (data.size() < used + CHUNK)
            data.resize(std::max(used + CHUNK, used + used / 2));
        size_t room = data.size() - used;
        int got = gzread(fp, data.data() + used,
                         static_cast<unsigned>(std::min(room, CHUNK)));
        if (got < 0) { gzclose(fp); return -2; }
        used += static_cast<size_t>(got);
        if (static_cast<size_t>(got) < CHUNK) break;
    }
    data.resize(used);
    gzclose(fp);
    return 0;
}

// Returns 0 on success; negative error codes otherwise.
int dtpu_read_fastx(const char *path, uint32_t sep_len, DtpuFastx *out) {
    std::vector<uint8_t> data;
    int rc = read_all(path, data);
    if (rc) return rc;
    std::memset(out, 0, sizeof(*out));
    if (data.empty()) {
        out->seq = static_cast<uint8_t *>(std::malloc(1));
        out->names = static_cast<char *>(std::malloc(1));
        out->rec_ends = static_cast<uint64_t *>(std::malloc(8));
        return 0;
    }
    const bool fastq = data[0] == '@';
    if (!fastq && data[0] != '>') return -3;

    std::vector<uint8_t> seq;
    seq.reserve(data.size());
    std::string names;
    std::vector<uint64_t> rec_ends;
    const uint8_t *p = data.data();
    const uint8_t *end = p + data.size();

    auto line_end = [&](const uint8_t *s) {
        const uint8_t *nl = static_cast<const uint8_t *>(
            std::memchr(s, '\n', static_cast<size_t>(end - s)));
        return nl ? nl : end;
    };
    auto push_name = [&](const uint8_t *s, const uint8_t *e) {
        // first whitespace-delimited token
        const uint8_t *t = s;
        while (t < e && *t != ' ' && *t != '\t' && *t != '\r') ++t;
        if (!names.empty()) names.push_back('\n');
        names.append(reinterpret_cast<const char *>(s),
                     static_cast<size_t>(t - s));
    };
    auto start_record = [&]() {
        if (!rec_ends.empty())
            seq.insert(seq.end(), sep_len, 0);
    };

    if (!fastq) {
        while (p < end) {
            if (*p != '>') return -4;
            const uint8_t *nl = line_end(p + 1);
            start_record();
            push_name(p + 1, nl);
            p = nl < end ? nl + 1 : end;
            while (p < end && *p != '>') {
                nl = line_end(p);
                const uint8_t *q = nl;
                while (q > p && (q[-1] == '\r')) --q;
                seq.insert(seq.end(), p, q);
                p = nl < end ? nl + 1 : end;
            }
            rec_ends.push_back(seq.size());
        }
    } else {
        // kseq record semantics (reference src/sketch_and_cmp.h:565-570):
        // sequence may wrap over multiple lines until the '+' separator;
        // quality is consumed by LENGTH, so a quality line starting with
        // '@' never opens a false record.
        while (p < end) {
            if (*p != '@') {
                if (*p == '\n' || *p == '\r') { ++p; continue; }
                return -5;
            }
            const uint8_t *nl = line_end(p + 1);
            start_record();
            push_name(p + 1, nl);
            p = nl < end ? nl + 1 : end;           // -> sequence line(s)
            const size_t seq_start = seq.size();
            // kseq stops sequence accumulation at '+', '@' or '>': a
            // record missing its '+' must not swallow the next record
            while (p < end && *p != '+' && *p != '@' && *p != '>') {
                nl = line_end(p);
                const uint8_t *q = nl;
                while (q > p && q[-1] == '\r') --q;
                seq.insert(seq.end(), p, q);
                p = nl < end ? nl + 1 : end;
            }
            const size_t slen = seq.size() - seq_start;
            rec_ends.push_back(seq.size());
            if (p < end && *p == '+') {            // quality exists
                nl = line_end(p);                  // skip the '+' line
                p = nl < end ? nl + 1 : end;
                size_t qlen = 0;                   // -> quality by length
                while (p < end && qlen < slen) {
                    nl = line_end(p);
                    const uint8_t *q = nl;
                    while (q > p && q[-1] == '\r') --q;
                    qlen += static_cast<size_t>(q - p);
                    p = nl < end ? nl + 1 : end;
                }
            }
        }
    }

    out->seq_len = seq.size();
    out->seq = static_cast<uint8_t *>(std::malloc(seq.size() ? seq.size() : 1));
    std::memcpy(out->seq, seq.data(), seq.size());
    out->names_len = names.size();
    // +1: the Python side reads this as a C string, so it must be
    // NUL-terminated (ctypes strlen-scans past the end otherwise)
    out->names = static_cast<char *>(std::malloc(names.size() + 1));
    std::memcpy(out->names, names.data(), names.size());
    out->names[names.size()] = '\0';
    out->nrecords = rec_ends.size();
    out->rec_ends = static_cast<uint64_t *>(
        std::malloc(rec_ends.size() ? rec_ends.size() * 8 : 8));
    std::memcpy(out->rec_ends, rec_ends.data(), rec_ends.size() * 8);
    return 0;
}

// Decompressed whole-file bytes (gz/zstd/plain) for the Python record
// parser — lets read_records handle zstd without a python zstd module.
int dtpu_read_raw(const char *path, uint8_t **buf, uint64_t *len) {
    std::vector<uint8_t> data;
    int rc = read_all(path, data);
    if (rc) return rc;
    *buf = static_cast<uint8_t *>(std::malloc(data.size() ? data.size() : 1));
    if (!*buf) return -8;   // let the Python fallback engage, don't segfault
    std::memcpy(*buf, data.data(), data.size());
    *len = data.size();
    return 0;
}

void dtpu_free_buf(uint8_t *p) { std::free(p); }

void dtpu_free(DtpuFastx *r) {
    std::free(r->seq);
    std::free(r->names);
    std::free(r->rec_ends);
    std::memset(r, 0, sizeof(*r));
}

}  // extern "C"
