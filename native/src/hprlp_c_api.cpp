/* C ABI for the TPU-native HPR-LP solver — see include/hprlp_tpu.h.
 *
 * Transport: one warm `python -m hprlp_tpu.server` worker over a pair of
 * pipes, speaking the line-delimited JSON + base64 protocol
 * (hprlp_tpu/server.py).  Role parity with the reference's in-process C
 * API (reference: include/HPRLP.h, src/HPRLP.cu:321-537) with the
 * process boundary replacing the shared library boundary.
 */

#include "../include/hprlp_tpu.h"

#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern char **environ;

namespace {

std::string g_last_error;

/* ---- base64 ----------------------------------------------------------- */

const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

std::string b64_encode(const unsigned char *data, size_t len) {
    std::string out;
    out.reserve((len + 2) / 3 * 4);
    for (size_t i = 0; i < len; i += 3) {
        unsigned v = data[i] << 16;
        if (i + 1 < len) v |= data[i + 1] << 8;
        if (i + 2 < len) v |= data[i + 2];
        out.push_back(B64[(v >> 18) & 63]);
        out.push_back(B64[(v >> 12) & 63]);
        out.push_back(i + 1 < len ? B64[(v >> 6) & 63] : '=');
        out.push_back(i + 2 < len ? B64[v & 63] : '=');
    }
    return out;
}

int b64_val(char c) {
    if (c >= 'A' && c <= 'Z') return c - 'A';
    if (c >= 'a' && c <= 'z') return c - 'a' + 26;
    if (c >= '0' && c <= '9') return c - '0' + 52;
    if (c == '+') return 62;
    if (c == '/') return 63;
    return -1;
}

std::vector<unsigned char> b64_decode(const std::string &s) {
    std::vector<unsigned char> out;
    out.reserve(s.size() / 4 * 3);
    unsigned buf = 0;
    int bits = 0;
    for (char c : s) {
        int v = b64_val(c);
        if (v < 0) continue; /* '=', whitespace */
        buf = (buf << 6) | (unsigned)v;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            out.push_back((unsigned char)((buf >> bits) & 0xff));
        }
    }
    return out;
}

template <typename T>
std::string b64_of(const T *v, int64_t n) {
    return b64_encode(reinterpret_cast<const unsigned char *>(v),
                      (size_t)n * sizeof(T));
}

std::vector<double> f64_of_b64(const std::string &s) {
    std::vector<unsigned char> raw = b64_decode(s);
    std::vector<double> out(raw.size() / 8);
    std::memcpy(out.data(), raw.data(), out.size() * 8);
    return out;
}

/* ---- tiny JSON -------------------------------------------------------- */

struct JsonValue {
    enum Kind { Null, Bool, Num, Str, Arr, Obj } kind = Null;
    bool b = false;
    double num = 0.0;
    std::string str;
    std::vector<JsonValue> arr;
    std::vector<std::pair<std::string, JsonValue>> obj;

    const JsonValue *get(const std::string &key) const {
        for (auto &kv : obj)
            if (kv.first == key) return &kv.second;
        return nullptr;
    }
    double num_or(const std::string &k, double d) const {
        const JsonValue *v = get(k);
        return v && v->kind == Num ? v->num : d;
    }
    std::string str_or(const std::string &k, const std::string &d) const {
        const JsonValue *v = get(k);
        return v && v->kind == Str ? v->str : d;
    }
};

struct JsonParser {
    const char *p, *end;
    bool ok = true;

    void ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                           *p == '\r'))
            ++p;
    }

    JsonValue value() {
        ws();
        JsonValue v;
        if (p >= end) { ok = false; return v; }
        if (*p == '{') return object();
        if (*p == '[') return array();
        if (*p == '"') {
            v.kind = JsonValue::Str;
            v.str = string();
            return v;
        }
        if (!strncmp(p, "true", 4)) { p += 4; v.kind = JsonValue::Bool; v.b = true; return v; }
        if (!strncmp(p, "false", 5)) { p += 5; v.kind = JsonValue::Bool; return v; }
        if (!strncmp(p, "null", 4)) { p += 4; return v; }
        char *num_end = nullptr;
        v.num = std::strtod(p, &num_end);
        if (num_end == p) { ok = false; return v; }
        p = num_end;
        v.kind = JsonValue::Num;
        return v;
    }

    /* Decode a 4-hex-digit escape payload; -1 on malformed input. */
    int hex4() {
        if (p + 4 > end) { ok = false; return -1; }
        int v = 0;
        for (int i = 0; i < 4; ++i) {
            char c = p[i];
            int d;
            if (c >= '0' && c <= '9') d = c - '0';
            else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
            else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
            else { ok = false; return -1; }
            v = (v << 4) | d;
        }
        p += 4;
        return v;
    }

    void append_utf8(std::string &out, unsigned cp) {
        if (cp < 0x80) {
            out.push_back((char)cp);
        } else if (cp < 0x800) {
            out.push_back((char)(0xC0 | (cp >> 6)));
            out.push_back((char)(0x80 | (cp & 0x3F)));
        } else if (cp < 0x10000) {
            out.push_back((char)(0xE0 | (cp >> 12)));
            out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back((char)(0x80 | (cp & 0x3F)));
        } else {
            out.push_back((char)(0xF0 | (cp >> 18)));
            out.push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
            out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back((char)(0x80 | (cp & 0x3F)));
        }
    }

    std::string string() {
        std::string out;
        ++p; /* opening quote */
        while (p < end && *p != '"') {
            if (*p == '\\' && p + 1 < end) {
                ++p;
                switch (*p) {
                    case 'n': out.push_back('\n'); ++p; break;
                    case 't': out.push_back('\t'); ++p; break;
                    case 'r': out.push_back('\r'); ++p; break;
                    case 'b': out.push_back('\b'); ++p; break;
                    case 'f': out.push_back('\f'); ++p; break;
                    case 'u': {
                        ++p;
                        int cp = hex4();
                        if (cp < 0) return out;
                        /* Surrogate pair -> one code point (RFC 8259). */
                        if (cp >= 0xD800 && cp <= 0xDBFF && p + 6 <= end
                            && p[0] == '\\' && p[1] == 'u') {
                            p += 2;
                            int lo = hex4();
                            if (lo < 0) return out;
                            if (lo >= 0xDC00 && lo <= 0xDFFF)
                                cp = 0x10000 + ((cp - 0xD800) << 10)
                                     + (lo - 0xDC00);
                            else
                                append_utf8(out, 0xFFFD), cp = lo;
                        } else if (cp >= 0xD800 && cp <= 0xDFFF) {
                            cp = 0xFFFD; /* lone surrogate */
                        }
                        append_utf8(out, (unsigned)cp);
                        break;
                    }
                    default: out.push_back(*p); ++p;
                }
            } else {
                out.push_back(*p);
                ++p;
            }
        }
        if (p < end) ++p; /* closing quote */
        return out;
    }

    JsonValue object() {
        JsonValue v;
        v.kind = JsonValue::Obj;
        ++p;
        ws();
        if (p < end && *p == '}') { ++p; return v; }
        while (p < end) {
            ws();
            std::string key = string();
            ws();
            if (p < end && *p == ':') ++p;
            v.obj.emplace_back(key, value());
            ws();
            if (p < end && *p == ',') { ++p; continue; }
            if (p < end && *p == '}') { ++p; break; }
            ok = false;
            break;
        }
        return v;
    }

    JsonValue array() {
        JsonValue v;
        v.kind = JsonValue::Arr;
        ++p;
        ws();
        if (p < end && *p == ']') { ++p; return v; }
        while (p < end) {
            v.arr.push_back(value());
            ws();
            if (p < end && *p == ',') { ++p; continue; }
            if (p < end && *p == ']') { ++p; break; }
            ok = false;
            break;
        }
        return v;
    }
};

std::string json_escape(const std::string &s) {
    /* Full RFC 8259 escaping: the transport is LINE-delimited JSON, so an
       unescaped newline in an MPS path would desynchronise the pipe
       protocol (round-2 review finding). */
    std::string out;
    char buf[8];
    for (unsigned char c : s) {
        switch (c) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            case '\b': out += "\\b"; break;
            case '\f': out += "\\f"; break;
            default:
                if (c < 0x20) {
                    std::snprintf(buf, sizeof buf, "\\u%04x", c);
                    out += buf;
                } else {
                    out.push_back((char)c);
                }
        }
    }
    return out;
}

/* ---- worker process --------------------------------------------------- */

struct Worker {
    pid_t pid = -1;
    FILE *to = nullptr;   /* our writes -> worker stdin */
    FILE *from = nullptr; /* worker stdout -> our reads */
};

Worker g_worker;

std::string default_root() {
    const char *env = std::getenv("HPRLP_TPU_ROOT");
    if (env) return env;
    return HPRLP_TPU_DEFAULT_ROOT;
}

bool worker_alive() {
    if (g_worker.pid <= 0) return false;
    int status = 0;
    return waitpid(g_worker.pid, &status, WNOHANG) == 0;
}

void worker_stop() {
    if (g_worker.pid > 0) {
        if (g_worker.to) {
            fputs("{\"op\":\"shutdown\"}\n", g_worker.to);
            fflush(g_worker.to);
        }
        if (g_worker.to) fclose(g_worker.to);
        if (g_worker.from) fclose(g_worker.from);
        int status = 0;
        waitpid(g_worker.pid, &status, 0);
    }
    g_worker = Worker();
}

bool worker_start() {
    if (worker_alive()) return true;
    if (g_worker.pid > 0) worker_stop();

    int in_pipe[2], out_pipe[2];
    if (pipe(in_pipe) || pipe(out_pipe)) {
        g_last_error = "pipe() failed";
        return false;
    }

    /* Build argv/envp BEFORE fork: the host process may be multithreaded
     * (JAX), and any allocation between fork and exec can deadlock the
     * child on a malloc lock another thread held at fork time. */
    std::string root = default_root();
    const char *old_pp = std::getenv("PYTHONPATH");
    std::string pp = "PYTHONPATH=" +
                     (old_pp ? root + ":" + old_pp : root);
    const char *py = std::getenv("HPRLP_TPU_PYTHON");
    if (!py) py = "python";
    std::string py_s = py;
    std::vector<std::string> env_store;
    for (char **e = environ; *e; ++e) {
        if (std::strncmp(*e, "PYTHONPATH=", 11) != 0)
            env_store.emplace_back(*e);
    }
    env_store.push_back(pp);
    std::vector<char *> envp;
    for (auto &s : env_store) envp.push_back(const_cast<char *>(s.c_str()));
    envp.push_back(nullptr);
    char *argv[] = {const_cast<char *>(py_s.c_str()),
                    const_cast<char *>("-m"),
                    const_cast<char *>("hprlp_tpu.server"), nullptr};

    pid_t pid = fork();
    if (pid < 0) {
        g_last_error = "fork() failed";
        return false;
    }
    if (pid == 0) {
        /* child: stdin <- in_pipe, stdout -> out_pipe; async-signal-safe
         * calls only (dup2/close/execvpe). */
        dup2(in_pipe[0], 0);
        dup2(out_pipe[1], 1);
        close(in_pipe[0]);
        close(in_pipe[1]);
        close(out_pipe[0]);
        close(out_pipe[1]);
        execvpe(argv[0], argv, envp.data());
        _exit(127);
    }
    close(in_pipe[0]);
    close(out_pipe[1]);
    g_worker.pid = pid;
    g_worker.to = fdopen(in_pipe[1], "w");
    g_worker.from = fdopen(out_pipe[0], "r");
    if (!g_worker.to || !g_worker.from) {
        g_last_error = "fdopen() failed";
        worker_stop();
        return false;
    }
    return true;
}

bool worker_rpc(const std::string &request, JsonValue &response) {
    if (!worker_start()) return false;
    fputs(request.c_str(), g_worker.to);
    fputc('\n', g_worker.to);
    if (fflush(g_worker.to) != 0) {
        g_last_error = "write to solver worker failed";
        return false;
    }
    std::string line;
    int c;
    while ((c = fgetc(g_worker.from)) != EOF && c != '\n')
        line.push_back((char)c);
    if (line.empty()) {
        g_last_error = "solver worker closed the connection";
        worker_stop();
        return false;
    }
    JsonParser parser{line.c_str(), line.c_str() + line.size()};
    response = parser.value();
    if (!parser.ok || response.kind != JsonValue::Obj) {
        g_last_error = "malformed response from solver worker";
        return false;
    }
    return true;
}

/* ---- model ------------------------------------------------------------ */

}  // namespace

struct hprlp_model {
    /* either an MPS path ... */
    std::string mps_path;
    /* ... or array data (CSR) */
    int64_t m = 0, n = 0;
    std::vector<int64_t> Ap;
    std::vector<int64_t> Ai; /* widened to i64 for the wire */
    std::vector<double> Ax, AL, AU, l, u, c;
    double obj_constant = 0.0;
};

extern "C" {

void hprlp_parameters_default(hprlp_parameters *p) {
    p->stop_tol = 1e-4;
    p->time_limit = 3600.0;
    p->max_iter = INT32_MAX;
    p->check_iter = 150;
    p->use_CR_scaling = 1;
    p->use_Ruiz_scaling = 1;
    p->use_Pock_Chambolle_scaling = 1;
    p->use_bc_scaling = 1;
    p->use_presolve = 1;
    std::snprintf(p->precision, sizeof(p->precision), "auto");
}

hprlp_model *hprlp_create_model_from_arrays(
    int64_t m, int64_t n, const int64_t *Ap, const int32_t *Ai,
    const double *Ax, const double *AL, const double *AU, const double *l,
    const double *u, const double *c, double obj_constant) {
    auto *mod = new (std::nothrow) hprlp_model();
    if (!mod) return nullptr;
    mod->m = m;
    mod->n = n;
    const int64_t nnz = Ap[m];
    mod->Ap.assign(Ap, Ap + m + 1);
    mod->Ai.assign(Ai, Ai + nnz);
    mod->Ax.assign(Ax, Ax + nnz);
    mod->AL.assign(AL, AL + m);
    mod->AU.assign(AU, AU + m);
    mod->l.assign(l, l + n);
    mod->u.assign(u, u + n);
    mod->c.assign(c, c + n);
    mod->obj_constant = obj_constant;
    /* Bounds are forwarded verbatim: the base64 transport carries raw
     * IEEE f64, so +-Inf and the >=1e20 numerical-infinity convention
     * both survive the trip and the solver normalises them itself. */
    return mod;
}

hprlp_model *hprlp_create_model_from_arrays_csc(
    int64_t m, int64_t n, const int64_t *Ap, const int32_t *Ai,
    const double *Ax, const double *AL, const double *AU, const double *l,
    const double *u, const double *c, double obj_constant) {
    /* CSC -> CSR counting-sort transpose (parity: src/HPRLP.cu:354-396,
     * src/utils.cu:203).  CSC of A == CSR of A^T, so transposing the
     * (n x m) CSR view yields A's CSR. */
    auto *mod = new (std::nothrow) hprlp_model();
    if (!mod) return nullptr;
    mod->m = m;
    mod->n = n;
    const int64_t nnz = Ap[n];
    mod->Ap.assign((size_t)m + 1, 0);
    mod->Ai.resize((size_t)nnz);
    mod->Ax.resize((size_t)nnz);
    for (int64_t k = 0; k < nnz; ++k) mod->Ap[(size_t)Ai[k] + 1]++;
    for (int64_t i = 0; i < m; ++i) mod->Ap[i + 1] += mod->Ap[i];
    std::vector<int64_t> next(mod->Ap.begin(), mod->Ap.end() - 1);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t k = Ap[j]; k < Ap[j + 1]; ++k) {
            const int64_t dst = next[Ai[k]]++;
            mod->Ai[(size_t)dst] = j;
            mod->Ax[(size_t)dst] = Ax[k];
        }
    mod->AL.assign(AL, AL + m);
    mod->AU.assign(AU, AU + m);
    mod->l.assign(l, l + n);
    mod->u.assign(u, u + n);
    mod->c.assign(c, c + n);
    mod->obj_constant = obj_constant;
    return mod;
}

hprlp_model *hprlp_create_model_from_mps(const char *path) {
    auto *mod = new (std::nothrow) hprlp_model();
    if (!mod) return nullptr;
    mod->mps_path = path;
    return mod;
}

const char *hprlp_last_error(void) { return g_last_error.c_str(); }

static void append_params(std::string &req, const hprlp_parameters *p) {
    hprlp_parameters def;
    if (!p) {
        hprlp_parameters_default(&def);
        p = &def;
    }
    char buf[512];
    std::snprintf(
        buf, sizeof(buf),
        "\"params\":{\"stop_tol\":%.17g,\"time_limit\":%.17g,"
        "\"max_iter\":%lld,\"check_iter\":%d,"
        "\"use_CR_scaling\":%s,\"use_Ruiz_scaling\":%s,"
        "\"use_Pock_Chambolle_scaling\":%s,\"use_bc_scaling\":%s,"
        "\"use_presolve\":%s,\"precision\":\"%s\"}",
        p->stop_tol, p->time_limit, (long long)p->max_iter, p->check_iter,
        p->use_CR_scaling ? "true" : "false",
        p->use_Ruiz_scaling ? "true" : "false",
        p->use_Pock_Chambolle_scaling ? "true" : "false",
        p->use_bc_scaling ? "true" : "false",
        p->use_presolve ? "true" : "false", p->precision);
    req += buf;
}

hprlp_results *hprlp_solve(hprlp_model *model,
                           const hprlp_parameters *params) {
    std::string req;
    if (!model->mps_path.empty()) {
        req = "{\"op\":\"solve_mps\",\"path\":\"" +
              json_escape(model->mps_path) + "\",";
    } else {
        req = "{\"op\":\"solve\",";
        char dims[128];
        std::snprintf(dims, sizeof(dims),
                      "\"m\":%lld,\"n\":%lld,\"obj_constant\":%.17g,",
                      (long long)model->m, (long long)model->n,
                      model->obj_constant);
        req += dims;
        req += "\"Ap\":\"" + b64_of(model->Ap.data(), model->m + 1) + "\",";
        req += "\"Ai\":\"" + b64_of(model->Ai.data(),
                                    (int64_t)model->Ai.size()) + "\",";
        req += "\"Ax\":\"" + b64_of(model->Ax.data(),
                                    (int64_t)model->Ax.size()) + "\",";
        req += "\"AL\":\"" + b64_of(model->AL.data(), model->m) + "\",";
        req += "\"AU\":\"" + b64_of(model->AU.data(), model->m) + "\",";
        req += "\"l\":\"" + b64_of(model->l.data(), model->n) + "\",";
        req += "\"u\":\"" + b64_of(model->u.data(), model->n) + "\",";
        req += "\"c\":\"" + b64_of(model->c.data(), model->n) + "\",";
    }
    append_params(req, params);
    req += "}";

    JsonValue resp;
    if (!worker_rpc(req, resp)) return nullptr;
    const JsonValue *okv = resp.get("ok");
    auto *r = new (std::nothrow) hprlp_results();
    if (!r) return nullptr;
    std::memset(r, 0, sizeof(*r));
    if (!okv || okv->kind != JsonValue::Bool || !okv->b) {
        g_last_error = resp.str_or("error", "unknown solver error");
        std::snprintf(r->status, sizeof(r->status), "ERROR");
        return r;
    }
    const JsonValue *res = resp.get("result");
    if (!res) {
        std::snprintf(r->status, sizeof(r->status), "ERROR");
        return r;
    }
    std::snprintf(r->status, sizeof(r->status), "%s",
                  res->str_or("status", "ERROR").c_str());
    r->iter = (int64_t)res->num_or("iter", 0);
    r->time = res->num_or("time", 0);
    r->primal_obj = res->num_or("primal_obj", 0);
    r->dual_obj = res->num_or("dual_obj", 0);
    r->gap = res->num_or("gap", 0);
    r->residuals = res->num_or("residuals", 0);
    r->iter4 = (int64_t)res->num_or("iter4", 0);
    r->iter6 = (int64_t)res->num_or("iter6", 0);
    r->iter8 = (int64_t)res->num_or("iter8", 0);
    r->time4 = res->num_or("time4", 0);
    r->time6 = res->num_or("time6", 0);
    r->time8 = res->num_or("time8", 0);
    auto vec = [&](const char *key, int64_t *len_out) -> double * {
        const JsonValue *v = res->get(key);
        if (!v || v->kind != JsonValue::Str || v->str.empty()) {
            *len_out = 0;
            return nullptr;
        }
        std::vector<double> d = f64_of_b64(v->str);
        *len_out = (int64_t)d.size();
        double *out = (double *)std::malloc(d.size() * sizeof(double));
        if (out) std::memcpy(out, d.data(), d.size() * sizeof(double));
        return out;
    };
    r->x = vec("x", &r->n);
    int64_t nz = 0;
    r->z = vec("z", &nz);
    r->y = vec("y", &r->m);
    if (r->z && nz != r->n) {
        /* hprlp_tpu.h documents n as the length of BOTH x and z; a
         * mismatched (e.g. truncated-but-parseable) response must not
         * let callers read z[0..n) past its allocation. */
        std::free(r->z);
        r->z = nullptr;
        std::snprintf(r->status, sizeof(r->status), "%s", "ERROR");
    }
    return r;
}

hprlp_batched_results *hprlp_solve_batched(
    hprlp_model *model, int64_t batch_size,
    const double *C, const double *AL, const double *AU,
    const double *l, const double *u, const double *obj_constants,
    const hprlp_parameters *params) {
    /* Parity: extern-C solve_batched (reference
     * src/batched_solver.cu:939-1092) — batch_size LPs sharing the
     * model's A; column-major (dim, B) dense inputs; presolve is forced
     * off server-side (solver/batched.py). */
    if (!model || batch_size <= 0 || !C || !AL || !AU || !l || !u) {
        g_last_error = "hprlp_solve_batched: bad arguments";
        return nullptr;
    }
    const int64_t B = batch_size;
    std::string req = "{\"op\":\"solve_batched\",";
    char dims[96];
    int64_t m = model->m, n = model->n;
    if (!model->mps_path.empty()) {
        /* MPS-backed model: the server parses the file and reuses its A;
         * the per-batch buffers' dimensions come from the caller-known
         * (m, n) of that file, so they are not re-sent. */
        req += "\"path\":\"" + json_escape(model->mps_path) + "\",";
        /* m/n for an MPS model are not stored host-side; ask the server
         * for the parsed dimensions so the dense buffers can be encoded
         * with the right lengths (the parse is cached server-side). */
        JsonValue dresp;
        if (!worker_rpc("{\"op\":\"mps_dims\",\"path\":\"" +
                            json_escape(model->mps_path) + "\"}",
                        dresp))
            return nullptr;
        const JsonValue *okv = dresp.get("ok");
        if (!okv || okv->kind != JsonValue::Bool || !okv->b) {
            g_last_error = dresp.str_or("error", "mps_dims failed");
            return nullptr;
        }
        const JsonValue *res = dresp.get("result");
        if (!res) { g_last_error = "mps_dims: empty result"; return nullptr; }
        m = (int64_t)res->num_or("m", 0);
        n = (int64_t)res->num_or("n", 0);
        if (m <= 0 || n <= 0) {
            g_last_error = "mps_dims: bad dimensions";
            return nullptr;
        }
    } else {
        std::snprintf(dims, sizeof(dims), "\"m\":%lld,\"n\":%lld,",
                      (long long)m, (long long)n);
        req += dims;
        req += "\"Ap\":\"" + b64_of(model->Ap.data(), m + 1) + "\",";
        req += "\"Ai\":\"" + b64_of(model->Ai.data(),
                                    (int64_t)model->Ai.size()) + "\",";
        req += "\"Ax\":\"" + b64_of(model->Ax.data(),
                                    (int64_t)model->Ax.size()) + "\",";
    }
    std::snprintf(dims, sizeof(dims), "\"batch\":%lld,", (long long)B);
    req += dims;
    req += "\"C\":\"" + b64_of(C, n * B) + "\",";
    req += "\"AL\":\"" + b64_of(AL, m * B) + "\",";
    req += "\"AU\":\"" + b64_of(AU, m * B) + "\",";
    req += "\"l\":\"" + b64_of(l, n * B) + "\",";
    req += "\"u\":\"" + b64_of(u, n * B) + "\",";
    if (obj_constants)
        req += "\"obj_constants\":\"" + b64_of(obj_constants, B) + "\",";
    append_params(req, params);
    req += "}";

    JsonValue resp;
    if (!worker_rpc(req, resp)) return nullptr;
    const JsonValue *okv = resp.get("ok");
    if (!okv || okv->kind != JsonValue::Bool || !okv->b) {
        g_last_error = resp.str_or("error", "unknown solver error");
        return nullptr;
    }
    const JsonValue *res = resp.get("result");
    if (!res) { g_last_error = "empty batched result"; return nullptr; }

    auto *r = new (std::nothrow) hprlp_batched_results();
    if (!r) return nullptr;
    std::memset(r, 0, sizeof(*r));
    r->m = (int64_t)res->num_or("m", m);
    r->n = (int64_t)res->num_or("n", n);
    r->batch_size = (int64_t)res->num_or("batch", B);
    r->time = res->num_or("time", 0);
    r->setup_time = res->num_or("setup_time", 0);
    r->solve_time = res->num_or("solve_time", 0);
    r->power_time = res->num_or("power_time", 0);

    bool bad = false;
    auto fvec = [&](const char *key, int64_t want) -> double * {
        const JsonValue *v = res->get(key);
        if (!v || v->kind != JsonValue::Str) { bad = true; return nullptr; }
        std::vector<double> d = f64_of_b64(v->str);
        if ((int64_t)d.size() != want) { bad = true; return nullptr; }
        double *out = (double *)std::malloc(want * sizeof(double));
        if (!out) { bad = true; return nullptr; }
        std::memcpy(out, d.data(), want * sizeof(double));
        return out;
    };
    r->x = fvec("x", r->n * r->batch_size);
    r->y = fvec("y", r->m * r->batch_size);
    r->z = fvec("z", r->n * r->batch_size);
    r->primal_obj = fvec("primal_obj", r->batch_size);
    r->residuals = fvec("residuals", r->batch_size);
    r->gap = fvec("gap", r->batch_size);
    const JsonValue *it = res->get("iter");
    if (it && it->kind == JsonValue::Str) {
        std::vector<double> raw = f64_of_b64(it->str);
        /* server encodes iter as i64; reinterpret the payload */
        if ((int64_t)(raw.size()) == r->batch_size) {
            r->iter = (int64_t *)std::malloc(r->batch_size
                                             * sizeof(int64_t));
            if (r->iter)
                std::memcpy(r->iter, raw.data(),
                            r->batch_size * sizeof(int64_t));
            else
                bad = true;
        } else {
            bad = true;
        }
    } else {
        bad = true;
    }
    r->status = (char *)std::calloc(r->batch_size, HPRLP_STATUS_STRLEN);
    const JsonValue *st = res->get("status");
    if (r->status && st && st->kind == JsonValue::Arr
        && (int64_t)st->arr.size() == r->batch_size) {
        for (int64_t k = 0; k < r->batch_size; ++k)
            std::snprintf(r->status + k * HPRLP_STATUS_STRLEN,
                          HPRLP_STATUS_STRLEN, "%s",
                          st->arr[k].kind == JsonValue::Str
                              ? st->arr[k].str.c_str()
                              : "ERROR");
    } else {
        bad = true;
    }
    if (bad) {
        g_last_error = "malformed batched response";
        if (r->status)
            for (int64_t k = 0; k < r->batch_size; ++k)
                std::snprintf(r->status + k * HPRLP_STATUS_STRLEN,
                              HPRLP_STATUS_STRLEN, "ERROR");
    }
    return r;
}

void hprlp_free_results(hprlp_results *r) {
    if (!r) return;
    std::free(r->x);
    std::free(r->y);
    std::free(r->z);
    delete r;
}

void hprlp_free_batched_results(hprlp_batched_results *r) {
    if (!r) return;
    std::free(r->x);
    std::free(r->y);
    std::free(r->z);
    std::free(r->primal_obj);
    std::free(r->residuals);
    std::free(r->gap);
    std::free(r->iter);
    std::free(r->status);
    delete r;
}

void hprlp_free_model(hprlp_model *m) { delete m; }

void hprlp_shutdown(void) { worker_stop(); }

}  /* extern "C" */
