// lcqpow_tpu native host runtime.
//
// The reference implements its entire runtime in C++ (problem ingestion,
// CSC conversion, file I/O: /root/reference/src/Utilities.cpp:312-650 and
// the load paths in src/LCQProblem.cpp:87-441).  In the TPU framework the
// *compute* path is JAX/XLA on device; this library is the native equivalent
// of the host-side runtime around it: fast problem-file parsing, CSC<->dense
// conversion, and batch packing for large instance fleets, callable from
// Python via ctypes (see lcqpow_tpu/native/__init__.py).  All functions are
// allocation-free C ABI operating on caller-provided numpy buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblcqpow_host.so lcqpow_host.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Parse whitespace-separated doubles from a file (the reference's
// Utilities::readFromFile format, src/Utilities.cpp:312-340).
// Returns the number of values parsed, or -1 on I/O error.  If out is null,
// only counts (two-pass usage: count, allocate in numpy, fill).
long lcqpow_read_doubles(const char* path, double* out, long cap) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size < 0) { std::fclose(f); return -1; }
    char* buf = static_cast<char*>(std::malloc(size + 1));
    if (!buf) { std::fclose(f); return -1; }
    long got = static_cast<long>(std::fread(buf, 1, size, f));
    std::fclose(f);
    buf[got] = '\0';

    long n = 0;
    const char* p = buf;
    char* end = nullptr;
    while (*p) {
        double v = std::strtod(p, &end);
        if (end == p) {  // not a number: skip one byte (whitespace/garbage)
            ++p;
            continue;
        }
        if (out) {
            if (n >= cap) { std::free(buf); return -2; }
            out[n] = v;
        }
        ++n;
        p = end;
    }
    std::free(buf);
    return n;
}

// Write doubles to a file, one per line with 17 significant digits
// (round-trip exact; reference Utilities::writeToFile,
// src/Utilities.cpp:369-395).  Returns 0 on success.
int lcqpow_write_doubles(const char* path, const double* vals, long n) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    for (long i = 0; i < n; ++i) std::fprintf(f, "%.17g\n", vals[i]);
    std::fclose(f);
    return 0;
}

// CSC -> dense row-major (reference csc_to_dns, src/Utilities.cpp:593-615).
// indptr: n+1 int64, indices: nnz int64, data: nnz doubles.
// out: m*n doubles, zero-initialized by this function.  Returns 0, or -1 on
// a structurally invalid input (out-of-range row index / bad pointers).
int lcqpow_csc_to_dense(long m, long n,
                        const int64_t* indptr, const int64_t* indices,
                        const double* data, double* out) {
    std::memset(out, 0, sizeof(double) * static_cast<size_t>(m) * n);
    if (indptr[0] != 0) return -1;
    for (long j = 0; j < n; ++j) {
        if (indptr[j + 1] < indptr[j]) return -1;
        for (int64_t k = indptr[j]; k < indptr[j + 1]; ++k) {
            int64_t i = indices[k];
            if (i < 0 || i >= m) return -1;
            out[i * n + j] = data[k];
        }
    }
    return 0;
}

// Dense row-major -> CSC, dropping exact zeros with the reference's
// (v > 0 || v < 0) test (src/Utilities.cpp:632).  Caller provides output
// buffers sized for the worst case (nnz <= m*n); returns nnz.
long lcqpow_dense_to_csc(long m, long n, const double* A,
                         int64_t* indptr, int64_t* indices, double* data) {
    long nnz = 0;
    indptr[0] = 0;
    for (long j = 0; j < n; ++j) {
        for (long i = 0; i < m; ++i) {
            double v = A[i * n + j];
            if (v > 0.0 || v < 0.0) {
                indices[nnz] = i;
                data[nnz] = v;
                ++nnz;
            }
        }
        indptr[j + 1] = nnz;
    }
    return nnz;
}

// Pack one instance's dense arrays into a slot of a padded batch buffer.
// Copies src (rows x cols, row-major) into dst (slot stride = pr*pc) at the
// top-left of a pr x pc padded tile.  The padding itself is whatever dst
// already holds (callers pre-fill with the pad pattern once).  This is the
// hot loop of fleet assembly: packing tens of thousands of heterogeneous
// instances into the fixed-shape batch the TPU solve consumes.
void lcqpow_pack_padded(const double* src, long rows, long cols,
                        double* dst, long pr, long pc, long slot) {
    double* base = dst + static_cast<size_t>(slot) * pr * pc;
    for (long i = 0; i < rows; ++i)
        std::memcpy(base + i * pc, src + i * cols, sizeof(double) * cols);
    (void)pr;
}

// Stationarity residual of a batch of candidate solutions, on the host
// (used by test harnesses / validators without touching the device):
//   stat = Qx + g + rho*Cx - A_int' y        (per instance)
// All arrays row-major; returns max-abs over each instance into out[b].
void lcqpow_batch_stationarity(long B, long n, long m,
                               const double* Q, const double* C,
                               const double* g, const double* rho,
                               const double* A, const double* x,
                               const double* y, double* out) {
    for (long b = 0; b < B; ++b) {
        const double* Qb = Q + static_cast<size_t>(b) * n * n;
        const double* Cb = C + static_cast<size_t>(b) * n * n;
        const double* Ab = A + static_cast<size_t>(b) * m * n;
        const double* xb = x + static_cast<size_t>(b) * n;
        const double* yb = y + static_cast<size_t>(b) * m;
        const double* gb = g + static_cast<size_t>(b) * n;
        double mx = 0.0;
        for (long i = 0; i < n; ++i) {
            double s = gb[i];
            for (long j = 0; j < n; ++j)
                s += (Qb[i * n + j] + rho[b] * Cb[i * n + j]) * xb[j];
            for (long k = 0; k < m; ++k)
                s -= Ab[k * n + i] * yb[k];
            double a = std::fabs(s);
            if (a > mx) mx = a;
        }
        out[b] = mx;
    }
}

int lcqpow_native_abi_version(void) { return 1; }

}  // extern "C"
