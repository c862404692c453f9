// rng_battery: native statistical test battery for the RNG emitters.
//
// The reference's clo_rng_bench writes a dieharder ASCII input file
// precisely so an EXTERNAL, non-OpenCL consumer can judge the stream
// (/root/reference/src/benchmarks/clo_rng_bench.c:266-270). This image
// ships no dieharder/PractRand/TestU01 binary and installs are not
// allowed, so this program is that external consumer: a standalone C++
// implementation of the NIST SP 800-22 core subset (monobit frequency,
// block frequency, runs, longest-run-of-ones, serial m=2, and a byte
// chi-square), reading the exact file format the Python emitter writes
// (`type: d` / `count:` / `numbit:` header, one decimal word per line).
// It is NOT a certified dieharder run — it is an independent end-to-end
// consumer of the emitted artifact in a different language/stack.
//
// Build:  g++ -O2 -std=c++17 rng_battery.cpp -o rng_battery
// Usage:  rng_battery FILE [FILE...]   (exit 0 iff every test passes)
//
// Pass criterion: p-value >= 0.0001 per test (dieharder's conventional
// "not failed" bar; NIST uses 0.01 for single sequences — both are
// reported).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

// Regularized upper incomplete gamma Q(a, x) — Numerical-Recipes-style
// series/continued-fraction split; enough precision for p-values.
static double gamma_q(double a, double x) {
    if (x < 0 || a <= 0) return 1.0;
    if (x == 0) return 1.0;
    const double gln = std::lgamma(a);
    if (x < a + 1.0) {  // series for P(a,x), return 1 - P
        double ap = a, sum = 1.0 / a, del = sum;
        for (int i = 0; i < 500; i++) {
            ap += 1.0;
            del *= x / ap;
            sum += del;
            if (std::fabs(del) < std::fabs(sum) * 1e-15) break;
        }
        return 1.0 - sum * std::exp(-x + a * std::log(x) - gln);
    }
    // continued fraction for Q(a,x)
    double b = x + 1.0 - a, c = 1e308, d = 1.0 / b, h = d;
    for (int i = 1; i < 500; i++) {
        double an = -1.0 * i * (i - a);
        b += 2.0;
        d = an * d + b;
        if (std::fabs(d) < 1e-300) d = 1e-300;
        c = b + an / c;
        if (std::fabs(c) < 1e-300) c = 1e-300;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (std::fabs(del - 1.0) < 1e-15) break;
    }
    return std::exp(-x + a * std::log(x) - gln) * h;
}

struct Result {
    const char *name;
    double p;
};

// bits packed LSB-first per emitted word (numbit bits per word)
struct BitStream {
    std::vector<uint8_t> bits;  // one byte per bit (simple, fast enough)
};

static bool load_dieharder(const char *path, BitStream *bs,
                           long *count_out, int *numbit_out) {
    FILE *f = std::fopen(path, "r");
    if (!f) return false;
    char line[256];
    long count = -1;
    int numbit = 32;
    // header: lines until the first pure-number line after seeing type:
    while (std::fgets(line, sizeof line, f)) {
        if (!std::strncmp(line, "type:", 5)) continue;
        if (!std::strncmp(line, "count:", 6)) {
            count = std::atol(line + 6);
            continue;
        }
        if (!std::strncmp(line, "numbit:", 7)) {
            numbit = std::atoi(line + 7);
            break;
        }
        break;  // tolerate missing header lines
    }
    bs->bits.reserve((count > 0 ? count : 1 << 20) * (size_t)numbit);
    while (std::fgets(line, sizeof line, f)) {
        char *end = nullptr;
        unsigned long long v = std::strtoull(line, &end, 10);
        if (end == line) continue;
        for (int b = 0; b < numbit; b++)
            bs->bits.push_back((uint8_t)((v >> b) & 1u));
    }
    std::fclose(f);
    *count_out = count;
    *numbit_out = numbit;
    return !bs->bits.empty();
}

static Result monobit(const BitStream &s) {
    long n = (long)s.bits.size(), ones = 0;
    for (uint8_t b : s.bits) ones += b;
    double sobs = std::fabs(2.0 * ones - n) / std::sqrt((double)n);
    return {"monobit_frequency", std::erfc(sobs / std::sqrt(2.0))};
}

static Result block_frequency(const BitStream &s, int M = 128) {
    long n = (long)s.bits.size(), N = n / M;
    double chi2 = 0;
    for (long i = 0; i < N; i++) {
        long ones = 0;
        for (int j = 0; j < M; j++) ones += s.bits[i * M + j];
        double pi = (double)ones / M - 0.5;
        chi2 += pi * pi;
    }
    chi2 *= 4.0 * M;
    return {"block_frequency_M128", gamma_q(N / 2.0, chi2 / 2.0)};
}

static Result runs(const BitStream &s) {
    long n = (long)s.bits.size(), ones = 0;
    for (uint8_t b : s.bits) ones += b;
    double pi = (double)ones / n;
    if (std::fabs(pi - 0.5) >= 2.0 / std::sqrt((double)n))
        return {"runs", 0.0};  // monobit precondition failed
    long v = 1;
    for (long i = 1; i < n; i++) v += (s.bits[i] != s.bits[i - 1]);
    double num = std::fabs(v - 2.0 * n * pi * (1 - pi));
    double den = 2.0 * std::sqrt(2.0 * n) * pi * (1 - pi);
    return {"runs", std::erfc(num / den)};
}

static Result longest_run8(const BitStream &s) {
    // NIST longest-run-of-ones, M=8, K=3, classes {<=1,2,3,>=4}
    static const double probs[4] = {0.2148, 0.3672, 0.2305, 0.1875};
    long n = (long)s.bits.size(), N = n / 8;
    if (N < 16) return {"longest_run_M8", 1.0};
    long v[4] = {0, 0, 0, 0};
    for (long i = 0; i < N; i++) {
        int longest = 0, run = 0;
        for (int j = 0; j < 8; j++) {
            run = s.bits[i * 8 + j] ? run + 1 : 0;
            if (run > longest) longest = run;
        }
        v[longest <= 1 ? 0 : longest >= 4 ? 3 : longest - 1]++;
    }
    double chi2 = 0;
    for (int k = 0; k < 4; k++) {
        double e = N * probs[k];
        chi2 += (v[k] - e) * (v[k] - e) / e;
    }
    return {"longest_run_M8", gamma_q(3 / 2.0, chi2 / 2.0)};
}

static Result serial2(const BitStream &s) {
    // NIST serial test m=2 (overlapping, circular): Δψ²₂ = ψ²₂ - ψ²₁
    long n = (long)s.bits.size();
    long c2[4] = {0, 0, 0, 0}, c1[2] = {0, 0};
    for (long i = 0; i < n; i++) {
        int b0 = s.bits[i], b1 = s.bits[(i + 1) % n];
        c2[b0 * 2 + b1]++;
        c1[b0]++;
    }
    double psi2 = 0, psi1 = 0;
    for (int k = 0; k < 4; k++) psi2 += (double)c2[k] * c2[k];
    for (int k = 0; k < 2; k++) psi1 += (double)c1[k] * c1[k];
    psi2 = psi2 * 4.0 / n - n;
    psi1 = psi1 * 2.0 / n - n;
    double del = psi2 - psi1;
    return {"serial_m2", gamma_q(1.0, del / 2.0)};  // 2^(m-1)/2 = 1
}

static Result byte_chi2(const BitStream &s) {
    long n = (long)s.bits.size(), N = n / 8;
    long c[256];
    std::memset(c, 0, sizeof c);
    for (long i = 0; i < N; i++) {
        int v = 0;
        for (int j = 0; j < 8; j++) v |= s.bits[i * 8 + j] << j;
        c[v]++;
    }
    double e = (double)N / 256, chi2 = 0;
    for (int k = 0; k < 256; k++) chi2 += (c[k] - e) * (c[k] - e) / e;
    return {"byte_chi_square", gamma_q(255 / 2.0, chi2 / 2.0)};
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s FILE [FILE...]\n", argv[0]);
        return 2;
    }
    int failures = 0;
    for (int a = 1; a < argc; a++) {
        BitStream s;
        long count;
        int numbit;
        if (!load_dieharder(argv[a], &s, &count, &numbit)) {
            std::fprintf(stderr, "%s: cannot read\n", argv[a]);
            return 2;
        }
        std::printf("# %s: %zu bits (%ld words x %d bits)\n", argv[a],
                    s.bits.size(), count, numbit);
        Result rs[6] = {monobit(s),      block_frequency(s), runs(s),
                        longest_run8(s), serial2(s),         byte_chi2(s)};
        for (const Result &r : rs) {
            const char *verdict = r.p >= 0.01      ? "PASS"
                                  : r.p >= 0.0001 ? "WEAK"
                                                  : "FAIL";
            if (r.p < 0.0001) failures++;
            std::printf("%-22s p=%.6f  %s\n", r.name, r.p, verdict);
        }
    }
    return failures ? 1 : 0;
}
