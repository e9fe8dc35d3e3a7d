// CPU baseline: a faithful reimplementation of the reference nanocall's
// Viterbi decoding hot loop (Viterbi.hpp:44-150) with its sparse
// per-state from-neighbour lists and on-the-fly emissions, threaded over
// reads like pfor (nanocall.cpp:611-619).
//
// The reference binary itself cannot be built in this environment (its
// fast5/hpptools/tclap submodules are absent from the snapshot), so this
// program stands in as the measured 8-thread CPU baseline of BASELINE.md:
// same state space (4096 6-mers), same 21-neighbour transition structure
// (stay + 4 step + 16 skip-1, State_Transitions.hpp:181-220), same float
// arithmetic, same O(n_ev x 4096 x 21) inner loop.
//
// Usage: cpu_nanocall [n_reads] [n_events] [n_threads] [events.bin]
// events.bin (optional): float32 little-endian (n_reads, n_events, 2)
// array of (mean, stdv) pairs — lets the bench feed BOTH sides the same
// model-generated workload.  Without it, inputs are synthesized uniform
// (timing is data-independent either way: the inner loop has a fixed
// op count and no data-dependent branches).
// Prints one line: events/s.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

static const int K = 6;
static const int N_STATES = 1 << (2 * K);

struct Neighbour {
    uint16_t from;
    float logp;
};

static inline unsigned suffix(unsigned i, unsigned k) {
    return i & ((1u << (2 * k)) - 1);
}
static inline unsigned prefix(unsigned i, unsigned k) {
    return i >> (2 * (K - (int)k));
}

// get_trans_prob (State_Transitions.hpp:125-144)
static float trans_prob(unsigned i, unsigned j, float p_stay, float p_step,
                        float p_skip_1) {
    float p = 0.0f;
    if (i == j) p += p_stay;
    if (suffix(i, K - 1) == prefix(j, K - 1)) p += p_step / 4.0f;
    for (int l = 2; l < K; ++l)
        if (suffix(i, K - l) == prefix(j, K - l))
            p += (float)(pow(p_skip_1, l - 1) / (1u << (2 * l)));
    p += (float)((pow(p_skip_1, K - 1) / (1.0 - p_skip_1)) / N_STATES);
    return p;
}

// compute_transitions_fast from-neighbour lists
static std::vector<std::vector<Neighbour>> build_from_lists(float p_stay,
                                                            float p_skip) {
    float p_step = 1.0f - p_stay - p_skip;
    float p_skip_1 = p_skip / (p_skip + 1.0f);
    std::vector<std::vector<Neighbour>> from_v(N_STATES);
    for (unsigned j = 0; j < (unsigned)N_STATES; ++j) {
        // candidate from-states: j (stay), 4 step-preds, 16 skip-preds
        std::vector<unsigned> cands;
        cands.push_back(j);
        for (unsigned b = 0; b < 4; ++b)
            cands.push_back((b << (2 * (K - 1))) | (j >> 2));
        for (unsigned c = 0; c < 16; ++c)
            cands.push_back((c << (2 * (K - 2))) | (j >> 4));
        // dedupe
        std::vector<unsigned> uniq;
        for (unsigned x : cands) {
            bool seen = false;
            for (unsigned y : uniq) seen |= (x == y);
            if (!seen) uniq.push_back(x);
        }
        for (unsigned i : uniq)
            from_v[j].push_back(
                {(uint16_t)i, std::log(trans_prob(i, j, p_stay, p_step, p_skip_1))});
    }
    return from_v;
}

struct Model {
    std::vector<float> level_mean, level_stdv, log_level_stdv;
    std::vector<float> sd_mean, sd_lambda, log_sd_lambda;
};

// log_normal_pdf + log_invgauss_pdf (Pore_Model.hpp:24-40)
static inline float log_emission(const Model& m, unsigned j, float ev_mean,
                                 float ev_stdv, float ev_log_stdv) {
    static const float log_2pi = std::log(2.0f * (float)M_PI);
    float a = (ev_mean - m.level_mean[j]) / m.level_stdv[j];
    float lnorm = -m.log_level_stdv[j] - (log_2pi + a * a) / 2.0f;
    float b = (ev_stdv - m.sd_mean[j]) / m.sd_mean[j];
    float linv = (m.log_sd_lambda[j] - log_2pi - 3.0f * ev_log_stdv -
                  m.sd_lambda[j] * b * b / ev_stdv) /
                 2.0f;
    return lnorm + linv;
}

struct Read {
    std::vector<float> mean, stdv, log_stdv;
};

// Viterbi::fill (Viterbi.hpp:44-99) + traceback (:120-142)
static double viterbi(const Model& m,
                      const std::vector<std::vector<Neighbour>>& from_v,
                      const Read& ev, std::vector<uint16_t>& path) {
    size_t T = ev.mean.size();
    std::vector<float> alpha(N_STATES), alpha_new(N_STATES);
    std::vector<uint16_t> bp(T * N_STATES);
    float log_n = std::log((float)N_STATES);
    for (int j = 0; j < N_STATES; ++j)
        alpha[j] = log_emission(m, j, ev.mean[0], ev.stdv[0], ev.log_stdv[0]) - log_n;
    for (size_t t = 1; t < T; ++t) {
        for (int j = 0; j < N_STATES; ++j) {
            float best = -INFINITY;
            uint16_t arg = N_STATES - 1;
            for (const auto& nb : from_v[j]) {
                float v = nb.logp + alpha[nb.from];
                if (v > best) {
                    best = v;
                    arg = nb.from;
                }
            }
            alpha_new[j] =
                best + log_emission(m, j, ev.mean[t], ev.stdv[t], ev.log_stdv[t]);
            bp[t * N_STATES + j] = arg;
        }
        std::swap(alpha, alpha_new);
    }
    float best = -INFINITY;
    uint16_t arg = 0;
    for (int j = 0; j < N_STATES; ++j)
        if (alpha[j] > best) {
            best = alpha[j];
            arg = (uint16_t)j;
        }
    path.resize(T);
    path[T - 1] = arg;
    for (size_t t = T - 1; t > 0; --t) path[t - 1] = bp[t * N_STATES + path[t]];
    return best;
}

int main(int argc, char** argv) {
    int n_reads = argc > 1 ? atoi(argv[1]) : 32;
    int n_events = argc > 2 ? atoi(argv[2]) : 4096;
    int n_threads = argc > 3 ? atoi(argv[3]) : 8;

    auto from_v = build_from_lists(0.1f, 0.3f);
    Model m;
    std::mt19937 gen(42);
    std::uniform_real_distribution<float> lm_d(40.f, 90.f), ls_d(0.8f, 2.0f),
        sm_d(0.5f, 1.5f), ss_d(0.1f, 0.4f);
    for (int j = 0; j < N_STATES; ++j) {
        float lm = lm_d(gen), ls = ls_d(gen), sm = sm_d(gen), ss = ss_d(gen);
        m.level_mean.push_back(lm);
        m.level_stdv.push_back(ls);
        m.log_level_stdv.push_back(std::log(ls));
        m.sd_mean.push_back(sm);
        float lam = sm * sm * sm / (ss * ss);
        m.sd_lambda.push_back(lam);
        m.log_sd_lambda.push_back(std::log(lam));
    }
    std::vector<Read> reads(n_reads);
    if (argc > 4) {
        FILE* f = fopen(argv[4], "rb");
        if (!f) {
            fprintf(stderr, "cannot open events file %s\n", argv[4]);
            return 1;
        }
        std::vector<float> row(2 * (size_t)n_events);
        for (auto& r : reads) {
            if (fread(row.data(), sizeof(float), row.size(), f) != row.size()) {
                fprintf(stderr, "short read from events file\n");
                return 1;
            }
            for (int t = 0; t < n_events; ++t) {
                r.mean.push_back(row[2 * t]);
                r.stdv.push_back(row[2 * t + 1]);
                r.log_stdv.push_back(std::log(row[2 * t + 1]));
            }
        }
        fclose(f);
    } else {
        for (auto& r : reads) {
            std::mt19937 g2(gen());
            std::uniform_real_distribution<float> mean_d(40.f, 90.f),
                stdv_d(0.5f, 1.5f);
            for (int t = 0; t < n_events; ++t) {
                r.mean.push_back(mean_d(g2));
                float s = stdv_d(g2);
                r.stdv.push_back(s);
                r.log_stdv.push_back(std::log(s));
            }
        }
    }

    auto t0 = std::chrono::steady_clock::now();
    std::atomic<int> next(0);
    std::atomic<long> check(0);
    std::vector<std::thread> pool;
    for (int w = 0; w < n_threads; ++w)
        pool.emplace_back([&]() {
            std::vector<uint16_t> path;
            int i;
            while ((i = next.fetch_add(1)) < n_reads) {
                viterbi(m, from_v, reads[i], path);
                check += path[0];
            }
        });
    for (auto& th : pool) th.join();
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    double evs = (double)n_reads * n_events;
    printf("{\"reads\": %d, \"events_per_read\": %d, \"threads\": %d, "
           "\"seconds\": %.3f, \"events_per_s\": %.0f, \"check\": %ld}\n",
           n_reads, n_events, n_threads, secs, evs / secs, (long)check.load());
    return 0;
}
