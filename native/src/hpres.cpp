/* hpres — native LP presolver.  See include/hpres.h for the contract.
 *
 * From-scratch C++ re-derivation of the reference's presolve capability
 * (reference: third_party/PSLP — explorers + typed postsolve log,
 * src/pslp_integration.cpp — integration semantics).  The reduction log is
 * replayed in EXACT reverse order at postsolve; each record's snapshot is
 * the problem state at reduction time, which makes the recovered dual
 * field consistent at every replay point (free-singleton substitution
 * folds its dual contribution into the modified costs, parallel-row merges
 * carry the merged dual until their own replay splits it).
 */

#include "../include/hpres.h"

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

struct Ent {
    int32_t r, c;
    double v;
    bool alive;
};

enum class RecType : uint8_t {
    EmptyRow,       // i                      -> y_i = 0
    RedundantRow,   // i                      -> y_i = 0
    SingletonRow,   // i, j, a, old bounds    -> y_i from z_j transfer
    ForcingRow,     // i, side, col list      -> y_i = extremal ratio, fix z
    ParallelRow,    // i (kept), j (removed row), s, bound provenance
    FixedCol,       // j, xj, col snapshot, c -> z_j = c_j - a_j^T y
    FreeSingletonCol, // j, i, a, cj, rstar, row snapshot -> x_j, y_i, z_j
    DoubletonEq,    // i, j (subbed out), k (kept): x_j from the equation,
                    // z split by bound provenance, y_i from stationarity
    ParallelCol,    // j (kept), k (merged away), s: columns k = s * j with
                    // costs in the same ratio; w = x_j + s x_k
    BoundChange,    // j, i, a: bound on x_j tightened to the implied bound
                    // from row i; replay transfers the bound multiplier to
                    // y_i (parity: PSLP BOUND_CHANGE_THE_ROW,
                    // include/core/Postsolver.h:50-51, retrieve_bound_change
                    // src/core/Postsolver.c:350-414)
    FixColInf,      // j: zero-cost column with zero locks on an INFINITE
                    // bound side — "fixed at infinity": every row through
                    // it becomes redundant and is deleted (dual 0); the
                    // log snapshots the rows with a finite side, and the
                    // replay recovers the least-extreme finite x_j that
                    // satisfies them all (parity: PSLP FIXED_COL_INF,
                    // src/explorers/Simple_dual_fix.c:78-106,
                    // src/core/Postsolver.c retrieve_fix_col_inf).
                    // Encoding: flag = 1 for +inf; d0 = own finite bound
                    // or +/-inf; idx = [nrows, (len, cols...)*];
                    // val = [(side, vals...)*].
    EqToIneq,       // j (removed singleton col), i (equality row relaxed to
                    // a one-sided inequality), a = a_ij, b = c_j, d0 = rhs:
                    // x_j implied free from ONE side only; its remaining
                    // explicit bound turns the equality into an inequality.
                    // Replay: x_j from the original row equation,
                    // z_j = -a * y_i (reduced dual), then y_i += c_j / a
                    // (parity: PSLP EQ_TO_INEQ + SUB_COL pair,
                    // src/explorers/StonCols.c:34-222,
                    // src/core/Postsolver.c:476-480, :133-157)
};

struct Rec {
    RecType type;
    int32_t i = -1, j = -1;
    double a = 0.0, b = 0.0, d0 = 0.0, d1 = 0.0;
    uint8_t flag = 0;
    std::vector<int32_t> idx;
    std::vector<double> val;
};

struct Problem {
    int64_t m, n;
    std::vector<Ent> ents;
    std::vector<std::vector<int64_t>> rowe, cole;  // entry ids (some dead)
    std::vector<int64_t> rlen, clen;               // live counts
    std::vector<char> ralive, calive;
    std::vector<double> AL, AU, l, u, c;
    double obj_shift = 0.0;
    int64_t live_entries = 0;  // live nnz (fill-in counted, kills deducted)

    // Incremental row activities (parity: PSLP Activity.h:44-70, lazily
    // EXACT instead of drift-prone deltas: any mutation that can change a
    // row's activity marks it dirty; readers recompute dirty rows only.
    // After round 1 most rows are untouched per pass, so the activity
    // passes drop from O(nnz) to O(changed) per sweep.
    std::vector<double> act_min, act_max;
    std::vector<int32_t> act_ninf_min, act_ninf_max;
    std::vector<char> act_ok;

    void touch_row(int64_t i) { if (!act_ok.empty()) act_ok[i] = 0; }

    // Call when x_j's bounds change: every live row through j goes stale.
    void touch_col(int64_t j) {
        if (act_ok.empty()) return;
        for (int64_t e : cole[j])
            if (ents[e].alive) act_ok[ents[e].r] = 0;
    }

    void kill_entry(int64_t e) {
        if (!ents[e].alive) return;
        ents[e].alive = false;
        rlen[ents[e].r]--;
        clen[ents[e].c]--;
        live_entries--;
        touch_row(ents[e].r);
    }

    void add_entry(int64_t r, int64_t c, double v) {
        int64_t id = (int64_t)ents.size();
        ents.push_back({(int32_t)r, (int32_t)c, v, true});
        rowe[r].push_back(id);
        cole[c].push_back(id);
        rlen[r]++;
        clen[c]++;
        live_entries++;
        touch_row(r);
    }
};

struct Stats {
    int64_t rows_removed = 0, cols_removed = 0, nnz_removed = 0, rounds = 0;
    int64_t bounds_tightened = 0;
    double time_s = 0.0;
    // Per-explorer wall time (parity: PSLP keeps per-explorer stats,
    // third_party/PSLP/include/PSLP/PSLP_stats.h:46-56).
    static constexpr int N_EXPLORERS = 9;
    double explorer_s[N_EXPLORERS] = {};
    static const char *explorer_name(int i) {
        static const char *names[N_EXPLORERS] = {
            "singleton_rows", "fixed_cols", "free_ston_cols",
            "doubleton_eq", "dual_fix", "activity_rows", "propagation",
            "parallel_rows", "parallel_cols"};
        return names[i];
    }
};

class Presolver {
  public:
    Problem P;
    std::vector<Rec> log;
    Stats stats;
    int status = HPRES_OK;
    double tol;

    // Reduced problem (built by compact()).
    std::vector<int64_t> red_Ap;
    std::vector<int32_t> red_Ai;
    std::vector<double> red_Ax, red_AL, red_AU, red_l, red_u, red_c;
    std::vector<int64_t> row_map, col_map;  // reduced pos -> original id
    int64_t red_m = 0, red_n = 0;

    bool infeas(bool cond) {
        if (cond) status = HPRES_INFEASIBLE;
        return cond;
    }

    // ---- reductions -----------------------------------------------------

    void remove_row_only(int64_t i, RecType t) {
        Rec r;
        r.type = t;
        r.i = (int32_t)i;
        log.push_back(std::move(r));
        for (int64_t e : P.rowe[i]) {
            if (P.ents[e].alive) {
                P.kill_entry(e);
                stats.nnz_removed++;
            }
        }
        P.ralive[i] = 0;
        stats.rows_removed++;
    }

    // Fix x_j = xj with a typed record carrying the live-column snapshot.
    void fix_col(int64_t j, double xj, RecType t = RecType::FixedCol) {
        Rec r;
        r.type = t;
        r.j = (int32_t)j;
        r.a = xj;
        r.b = P.c[j];
        for (int64_t e : P.cole[j]) {
            const Ent &en = P.ents[e];
            if (!en.alive) continue;
            r.idx.push_back(en.r);
            r.val.push_back(en.v);
            // Shift the row bounds by the fixed contribution.
            if (std::isfinite(P.AL[en.r])) P.AL[en.r] -= en.v * xj;
            if (std::isfinite(P.AU[en.r])) P.AU[en.r] -= en.v * xj;
            P.kill_entry(e);
            stats.nnz_removed++;
        }
        log.push_back(std::move(r));
        P.obj_shift += P.c[j] * xj;
        P.calive[j] = 0;
        stats.cols_removed++;
    }

    bool pass_empty_and_singleton_rows() {
        bool changed = false;
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i]) continue;
            if (P.rlen[i] == 0) {
                if (infeas(P.AL[i] > tol || P.AU[i] < -tol)) return changed;
                remove_row_only(i, RecType::EmptyRow);
                changed = true;
            } else if (P.rlen[i] == 1) {
                int64_t e = -1;
                for (int64_t k : P.rowe[i])
                    if (P.ents[k].alive) { e = k; break; }
                const double a = P.ents[e].v;
                const int64_t j = P.ents[e].c;
                if (std::fabs(a) < 1e-300) {  // true numerical zero only:
                    // a small-but-nonzero coefficient still constrains x_j
                    // (the implied bounds below are just large), so it must
                    // NOT be dropped — 1e-13*x <= 1 really means x <= 1e13.
                    if (infeas(P.AL[i] > tol || P.AU[i] < -tol)) return changed;
                    remove_row_only(i, RecType::EmptyRow);
                    changed = true;
                    continue;
                }
                double lo = (a > 0 ? P.AL[i] : P.AU[i]) / a;
                double up = (a > 0 ? P.AU[i] : P.AL[i]) / a;
                Rec r;
                r.type = RecType::SingletonRow;
                r.i = (int32_t)i;
                r.j = (int32_t)j;
                r.a = a;
                r.d0 = P.l[j];
                r.d1 = P.u[j];
                uint8_t lo_from_row = 0, up_from_row = 0;
                if (lo > P.l[j]) { P.l[j] = lo; lo_from_row = 1; }
                if (up < P.u[j]) { P.u[j] = up; up_from_row = 1; }
                if (lo_from_row || up_from_row) P.touch_col(j);
                r.flag = (uint8_t)(lo_from_row | (up_from_row << 1));
                if (infeas(P.l[j] > P.u[j] + tol)) return changed;
                log.push_back(std::move(r));
                P.kill_entry(e);
                stats.nnz_removed++;
                P.ralive[i] = 0;
                stats.rows_removed++;
                changed = true;
            }
        }
        return changed;
    }

    bool pass_fixed_and_empty_cols() {
        bool changed = false;
        for (int64_t j = 0; j < P.n; ++j) {
            if (!P.calive[j]) continue;
            if (P.clen[j] == 0) {
                double xj;
                if (P.c[j] > tol) {
                    if (P.l[j] == -INF) { status = HPRES_UNBOUNDED; return changed; }
                    xj = P.l[j];
                } else if (P.c[j] < -tol) {
                    if (P.u[j] == INF) { status = HPRES_UNBOUNDED; return changed; }
                    xj = P.u[j];
                } else {
                    xj = std::min(std::max(0.0, P.l[j]), P.u[j]);
                    if (!std::isfinite(xj)) xj = std::isfinite(P.l[j]) ? P.l[j]
                                               : (std::isfinite(P.u[j]) ? P.u[j] : 0.0);
                }
                fix_col(j, xj);
                changed = true;
            } else if (P.u[j] - P.l[j] <= tol && std::isfinite(P.l[j])) {
                fix_col(j, 0.5 * (P.l[j] + P.u[j]));
                changed = true;
            }
        }
        return changed;
    }

    // Up/down locks (parity: PSLP Locks semantics, Gurobi-paper dual fixing).
    bool pass_dual_fix() {
        std::vector<int32_t> up(P.n, 0), down(P.n, 0);
        for (const Ent &e : P.ents) {
            if (!e.alive) continue;
            const bool has_lo = P.AL[e.r] != -INF;
            const bool has_up = P.AU[e.r] != INF;
            if (e.v > 0) {
                if (has_up) up[e.c]++;
                if (has_lo) down[e.c]++;
            } else {
                if (has_lo) up[e.c]++;
                if (has_up) down[e.c]++;
            }
        }
        bool changed = false;
        // Zero-cost columns whose lock-free bound side is INFINITE are
        // "fixed at infinity" AFTER the main sweep (deleting their rows
        // can only remove locks, so the snapshot stays valid — same
        // deferral as PSLP, Simple_dual_fix.c:145-170).
        std::vector<std::pair<int64_t, bool>> to_inf;  // (col, positive)
        for (int64_t j = 0; j < P.n; ++j) {
            if (!P.calive[j] || P.clen[j] == 0) continue;
            if (P.c[j] >= 0.0 && down[j] == 0) {
                if (P.l[j] == -INF) {
                    if (P.c[j] > tol) { status = HPRES_UNBOUNDED; return changed; }
                    if (P.c[j] == 0.0) to_inf.emplace_back(j, false);
                    continue;
                }
                fix_col(j, P.l[j]);
                changed = true;
            } else if (P.c[j] <= 0.0 && up[j] == 0) {
                if (P.u[j] == INF) {
                    if (P.c[j] < -tol) { status = HPRES_UNBOUNDED; return changed; }
                    if (P.c[j] == 0.0) to_inf.emplace_back(j, true);
                    continue;
                }
                fix_col(j, P.u[j]);
                changed = true;
            }
        }
        for (auto [j, pos] : to_inf) {
            if (!P.calive[j]) continue;  // a prior inf-fix emptied it
            fix_col_inf(j, pos);
            changed = true;
        }
        return changed;
    }

    // "Fix at infinity": delete every row through j (their duals are 0 —
    // each is strictly slack or tight-with-zero-multiplier at the
    // recovered point) and log the finite-side rows so postsolve can
    // choose the least-extreme feasible x_j.
    void fix_col_inf(int64_t j, bool pos) {
        Rec r;
        r.type = RecType::FixColInf;
        r.j = (int32_t)j;
        r.flag = pos ? 1 : 0;
        r.d0 = pos ? P.l[j] : P.u[j];
        r.idx.push_back(0);  // nrows, patched below
        int32_t nrows = 0;
        for (int64_t e : P.cole[j]) {
            if (!P.ents[e].alive) continue;
            const int64_t i = P.ents[e].r;
            // Exactly one side can be finite (the blocking side is open
            // by the zero-lock condition); fully free rows impose
            // nothing but are deleted all the same.
            const double side = std::isfinite(P.AL[i]) ? P.AL[i]
                                : (std::isfinite(P.AU[i]) ? P.AU[i] : INF);
            if (std::isfinite(side)) {
                const size_t lenpos = r.idx.size();
                r.idx.push_back(0);
                r.val.push_back(side);
                int32_t len = 0;
                for (int64_t e2 : P.rowe[i]) {
                    const Ent &en = P.ents[e2];
                    if (!en.alive) continue;
                    r.idx.push_back(en.c);
                    r.val.push_back(en.v);
                    len++;
                }
                r.idx[lenpos] = len;
                nrows++;
            }
            for (int64_t e2 : P.rowe[i]) {
                if (P.ents[e2].alive) {
                    P.kill_entry(e2);
                    stats.nnz_removed++;
                }
            }
            P.ralive[i] = 0;
            stats.rows_removed++;
        }
        r.idx[0] = nrows;
        log.push_back(std::move(r));
        P.calive[j] = 0;
        stats.cols_removed++;
    }

    // Per-side implied-freeness of x_j given row i's other variables at
    // their bounds (parity: PSLP StonCols implied-free tests,
    // include/explorers/StonCols.h:27-52).  lo_ok: the explicit lower
    // bound can never be active; up_ok: same for the upper bound.
    void implied_free_sides(int64_t j, int64_t i, double a,
                            bool &lo_ok, bool &up_ok) {
        if (P.l[j] == -INF && P.u[j] == INF) {
            lo_ok = up_ok = true;
            return;
        }
        double rest_min = 0.0, rest_max = 0.0;
        for (int64_t e : P.rowe[i]) {
            const Ent &en = P.ents[e];
            if (!en.alive || en.c == j) continue;
            const double lo = P.l[en.c], up = P.u[en.c];
            if (en.v > 0) {
                if (lo == -INF || rest_min == -INF) rest_min = -INF;
                else rest_min += en.v * lo;
                if (up == INF || rest_max == INF) rest_max = INF;
                else rest_max += en.v * up;
            } else {
                if (up == INF || rest_min == -INF) rest_min = -INF;
                else rest_min += en.v * up;
                if (lo == -INF || rest_max == INF) rest_max = INF;
                else rest_max += en.v * lo;
            }
        }
        // a x_j in [AL - rest_max, AU - rest_min].
        const double lo_num = P.AL[i] == -INF || rest_max == INF
                              ? -INF : P.AL[i] - rest_max;
        const double up_num = P.AU[i] == INF || rest_min == -INF
                              ? INF : P.AU[i] - rest_min;
        const double ij_lo = a > 0 ? lo_num / a
                             : (up_num == INF ? -INF : up_num / a);
        const double ij_up = a > 0 ? up_num / a
                             : (lo_num == -INF ? INF : lo_num / a);
        lo_ok = P.l[j] == -INF ||
                (ij_lo != -INF && ij_lo >= P.l[j] - tol);
        up_ok = P.u[j] == INF ||
                (ij_up != INF && ij_up <= P.u[j] + tol);
    }

    // Singleton column j (only entry a in equality row i) implied free
    // from ONE side: substitute x_j out via the row equation and relax
    // the equality to the inequality that enforces x_j's surviving
    // explicit bound (parity: PSLP handle_impl_free_from_{above,below}_eq,
    // src/explorers/StonCols.c:34-222).
    void eq_to_ineq(int64_t j, int64_t i, int64_t e, double a, bool up_ok) {
        const double R = P.AL[i];  // == P.AU[i]
        const double ca = P.c[j] / a;
        Rec r;
        r.type = RecType::EqToIneq;
        r.j = (int32_t)j;
        r.i = (int32_t)i;
        r.a = a;
        r.b = P.c[j];
        r.d0 = R;
        for (int64_t k : P.rowe[i]) {
            const Ent &en = P.ents[k];
            if (!en.alive || en.c == j) continue;
            r.idx.push_back(en.c);
            r.val.push_back(en.v);
            P.c[en.c] -= ca * en.v;
        }
        P.obj_shift += ca * R;
        log.push_back(std::move(r));
        P.kill_entry(e);
        stats.nnz_removed++;
        if (up_ok) {
            // Upper bound implied: the explicit l_j survives as
            //   (R - sum) / a >= l_j.
            const double s = R - a * P.l[j];
            if (a > 0) { P.AL[i] = -INF; P.AU[i] = s; }
            else       { P.AL[i] = s;    P.AU[i] = INF; }
        } else {
            // Lower bound implied: the explicit u_j survives as
            //   (R - sum) / a <= u_j.
            const double s = R - a * P.u[j];
            if (a > 0) { P.AL[i] = s;    P.AU[i] = INF; }
            else       { P.AL[i] = -INF; P.AU[i] = s; }
        }
        P.touch_row(i);
        P.calive[j] = 0;
        stats.cols_removed++;
    }

    bool pass_free_singleton_cols() {
        bool changed = false;
        for (int64_t j = 0; j < P.n; ++j) {
            if (!P.calive[j] || P.clen[j] != 1) continue;
            int64_t e = -1;
            for (int64_t k : P.cole[j])
                if (P.ents[k].alive) { e = k; break; }
            const int64_t i = P.ents[e].r;
            const double a = P.ents[e].v;
            if (std::fabs(a) < 1e-10) continue;
            bool lo_ok = false, up_ok = false;
            implied_free_sides(j, i, a, lo_ok, up_ok);
            if (!(lo_ok && up_ok)) {
                // One-sided implied freeness reduces only EQUALITY rows
                // (with other live entries; a pure singleton row is the
                // singleton-row explorer's case).
                if ((lo_ok || up_ok) && P.rlen[i] >= 2 &&
                    std::isfinite(P.AL[i]) && P.AL[i] == P.AU[i]) {
                    eq_to_ineq(j, i, e, a, up_ok);
                    changed = true;
                }
                continue;
            }
            const double ca = P.c[j] / a;
            // Row value r* the optimum drives the row to.
            double rstar;
            if (ca > tol) {
                rstar = P.AL[i];
                if (rstar == -INF) { status = HPRES_UNBOUNDED; return changed; }
            } else if (ca < -tol) {
                rstar = P.AU[i];
                if (rstar == INF) { status = HPRES_UNBOUNDED; return changed; }
            } else {
                rstar = std::isfinite(P.AL[i]) ? P.AL[i]
                       : (std::isfinite(P.AU[i]) ? P.AU[i] : 0.0);
            }
            Rec r;
            r.type = RecType::FreeSingletonCol;
            r.j = (int32_t)j;
            r.i = (int32_t)i;
            r.a = a;
            r.b = P.c[j];
            r.d0 = rstar;
            // Snapshot the rest of the row; fold c_j/a into their costs so
            // later reductions (and the reduced problem) already carry the
            // dual contribution of the removed row.
            for (int64_t k : P.rowe[i]) {
                const Ent &en = P.ents[k];
                if (!en.alive || en.c == j) continue;
                r.idx.push_back(en.c);
                r.val.push_back(en.v);
                P.c[en.c] -= ca * en.v;
            }
            P.obj_shift += ca * rstar;
            log.push_back(std::move(r));
            for (int64_t k : P.rowe[i]) {
                if (P.ents[k].alive) {
                    P.kill_entry(k);
                    stats.nnz_removed++;
                }
            }
            P.ralive[i] = 0;
            P.calive[j] = 0;
            stats.rows_removed++;
            stats.cols_removed++;
            changed = true;
        }
        return changed;
    }

    // Recompute row i's cached activity (the only writer of the cache).
    void ensure_activity(int64_t i) {
        if (P.act_ok[i]) return;
        double amin = 0.0, amax = 0.0;
        int32_t inf_min = 0, inf_max = 0;
        for (int64_t e : P.rowe[i]) {
            const Ent &en = P.ents[e];
            if (!en.alive) continue;
            const double lo = P.l[en.c], up = P.u[en.c];
            if (en.v > 0) {
                if (lo == -INF) inf_min++; else amin += en.v * lo;
                if (up == INF) inf_max++; else amax += en.v * up;
            } else {
                if (up == INF) inf_min++; else amin += en.v * up;
                if (lo == -INF) inf_max++; else amax += en.v * lo;
            }
        }
        P.act_min[i] = amin;
        P.act_max[i] = amax;
        P.act_ninf_min[i] = inf_min;
        P.act_ninf_max[i] = inf_max;
        P.act_ok[i] = 1;
    }

    // Row activity bounds -> redundant / forcing / infeasible rows.
    bool pass_activity_rows() {
        bool changed = false;
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i] || P.rlen[i] == 0) continue;
            ensure_activity(i);
            const double amin = P.act_min[i], amax = P.act_max[i];
            const int32_t inf_min = P.act_ninf_min[i];
            const int32_t inf_max = P.act_ninf_max[i];
            const double act_min = inf_min ? -INF : amin;
            const double act_max = inf_max ? INF : amax;
            if (infeas(act_min > P.AU[i] + tol || act_max < P.AL[i] - tol))
                return changed;
            if (act_min >= P.AL[i] - tol && act_max <= P.AU[i] + tol) {
                remove_row_only(i, RecType::RedundantRow);
                changed = true;
                continue;
            }
            // Forcing rows: activity bound equals a constraint bound, so
            // every variable in the row is forced to the bound achieving it.
            const bool force_up = (inf_min == 0 && amin >= P.AU[i] - tol);
            const bool force_lo = (inf_max == 0 && amax <= P.AL[i] + tol);
            if (force_up || force_lo) {
                Rec r;
                r.type = RecType::ForcingRow;
                r.i = (int32_t)i;
                r.flag = force_up ? 1 : 0;  // 1: row at AU, duals <= 0
                std::vector<std::pair<int64_t, double>> cols;
                for (int64_t e : P.rowe[i]) {
                    const Ent &en = P.ents[e];
                    if (!en.alive) continue;
                    r.idx.push_back(en.c);
                    r.val.push_back(en.v);
                    cols.push_back({en.c, en.v});
                }
                // Record BEFORE the fixes: reverse replay then runs the
                // fixes first (z with y_i=0) and this record fixes up y_i/z.
                log.push_back(std::move(r));
                remove_row_only(i, RecType::RedundantRow);
                // The RedundantRow record above is replayed BEFORE the
                // ForcingRow record (it is later in the log): y_i = 0 is
                // then overwritten by the forcing fix-up.  Fix every col.
                for (auto &[jc, av] : cols) {
                    if (!P.calive[jc]) continue;
                    const bool at_lower = force_up ? (av > 0) : (av < 0);
                    fix_col(jc, at_lower ? P.l[jc] : P.u[jc]);
                }
                changed = true;
            }
        }
        return changed;
    }

    // Doubleton equality  a_j x_j + a_k x_k = b  ->  substitute x_j out.
    // x_j's bounds translate onto x_k; every other row containing x_j gets
    // fill-in at column k.  Dual recovery splits z between (z_j, z_k) by
    // bound provenance and derives y_i from x_j's stationarity (the
    // identity z_k_reduced = z_k - (a_k/a_j) z_j; see postsolve).
    bool pass_doubleton_eq(int max_fill_rows = 8) {
        bool changed = false;
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i] || P.rlen[i] != 2) continue;
            if (P.AL[i] != P.AU[i]) continue;
            const double b = P.AL[i];
            if (!std::isfinite(b)) continue;
            int64_t e1 = -1, e2 = -1;
            for (int64_t e : P.rowe[i]) {
                if (!P.ents[e].alive) continue;
                (e1 < 0 ? e1 : e2) = e;
            }
            // Substitute out the variable whose column is sparser (bounds
            // the fill-in), preferring a well-scaled pivot.
            int64_t ej = e1, ek = e2;
            if (P.clen[P.ents[e2].c] < P.clen[P.ents[e1].c])
                std::swap(ej, ek);
            const int64_t j = P.ents[ej].c, k = P.ents[ek].c;
            const double aj = P.ents[ej].v, ak = P.ents[ek].v;
            if (std::fabs(aj) < 1e-8 * std::max(1.0, std::fabs(ak)))
                continue;
            if (P.clen[j] - 1 > max_fill_rows) continue;

            Rec r;
            r.type = RecType::DoubletonEq;
            r.i = (int32_t)i;
            r.j = (int32_t)j;
            r.a = aj;
            r.b = ak;
            r.d0 = b;
            r.d1 = P.c[j];
            // val[0..3] = l_j, u_j, old l_k, old u_k; idx[0] = k;
            // then the j-column snapshot (rows != i).
            r.idx.push_back((int32_t)k);
            r.val.push_back(P.l[j]);
            r.val.push_back(P.u[j]);
            r.val.push_back(P.l[k]);
            r.val.push_back(P.u[k]);

            // Translated bounds on x_k from x_j in [l_j, u_j]:
            // x_k = (b - aj x_j) / ak.
            const double t1 = std::isfinite(P.u[j])
                              ? (b - aj * P.u[j]) / ak : (aj / ak > 0 ? -INF : INF);
            const double t2 = std::isfinite(P.l[j])
                              ? (b - aj * P.l[j]) / ak : (aj / ak > 0 ? INF : -INF);
            const double lo_t = std::min(t1, t2), up_t = std::max(t1, t2);
            if (lo_t > P.l[k]) P.l[k] = lo_t;
            if (up_t < P.u[k]) P.u[k] = up_t;
            P.touch_col(k);
            if (infeas(P.l[k] > P.u[k] + tol)) return changed;

            // Substitute into the other rows of column j (fill-in at k):
            // x_j = b/aj - (ak/aj) x_k.
            for (int64_t e : P.cole[j]) {
                const Ent &en = P.ents[e];
                if (!en.alive || en.r == i) continue;
                const int64_t rr = en.r;
                const double arj = en.v;
                r.idx.push_back((int32_t)rr);
                r.val.push_back(arj);
                // Row rr: arj * x_j = arj*b/aj - (arj*ak/aj) x_k.
                const double shift = arj * b / aj;
                if (std::isfinite(P.AL[rr])) P.AL[rr] -= shift;
                if (std::isfinite(P.AU[rr])) P.AU[rr] -= shift;
                const double delta = -arj * ak / aj;
                // Find existing (rr, k) entry.
                int64_t hit = -1;
                for (int64_t e2i : P.rowe[rr]) {
                    const Ent &em = P.ents[e2i];
                    if (em.alive && em.c == k) { hit = e2i; break; }
                }
                if (hit >= 0) {
                    P.ents[hit].v += delta;
                    P.touch_row(rr);
                    if (std::fabs(P.ents[hit].v) < 1e-14) {
                        P.kill_entry(hit);
                        stats.nnz_removed++;
                    }
                } else if (delta != 0.0) {
                    P.add_entry(rr, k, delta);
                }
                P.kill_entry(e);
                stats.nnz_removed++;
            }
            // Objective: c_j x_j = c_j b/aj - (c_j ak/aj) x_k.
            P.c[k] -= P.c[j] * ak / aj;
            P.obj_shift += P.c[j] * b / aj;

            log.push_back(std::move(r));
            // Remove row i and column j.
            for (int64_t e : P.rowe[i]) {
                if (P.ents[e].alive) {
                    P.kill_entry(e);
                    stats.nnz_removed++;
                }
            }
            P.ralive[i] = 0;
            P.calive[j] = 0;
            stats.rows_removed++;
            stats.cols_removed++;
            changed = true;
        }
        return changed;
    }

    // Parallel rows/cols share a two-level detection scheme: a cheap u64
    // fingerprint per item (sorted pattern + 1e-9-quantised value ratios,
    // computed with no per-item heap key), then exact ratio comparison only
    // inside colliding fingerprint buckets.  PSLP hashes pattern first and
    // coefficients second the same way (include/explorers/Parallel_rows.h:
    // 37-60); the flat fingerprint pass replaces the per-item vector key +
    // unordered_map that dominated the 10M-nnz profile (parallel_rows +
    // parallel_cols were 6.7 s of a 9.5 s loop, benchmarks/
    // report_presolve_scale.json).
    static uint64_t pattern_fingerprint(
        const std::vector<std::pair<int32_t, double>> &buf) {
        uint64_t h = 1469598103934665603ull;
        const double v0 = buf[0].second;
        for (const auto &[idx, v] : buf) {
            h = (h ^ (uint64_t)(uint32_t)idx) * 1099511628211ull;
            // Quantised ratio hash; equality is verified exactly below.
            const int64_t q = (int64_t)std::llround(v / v0 * 1e9);
            h = (h ^ (uint64_t)q) * 1099511628211ull;
        }
        return h;
    }

    static bool patterns_parallel(
        const std::vector<std::pair<int32_t, double>> &a,
        const std::vector<std::pair<int32_t, double>> &b) {
        if (a.size() != b.size()) return false;
        const double va = a[0].second, vb = b[0].second;
        for (size_t t = 0; t < a.size(); ++t) {
            if (a[t].first != b[t].first) return false;
            const double ra = a[t].second / va, rb = b[t].second / vb;
            if (std::fabs(ra - rb) > 1e-12 * std::max(1.0, std::fabs(ra)))
                return false;
        }
        return true;
    }

    bool pass_parallel_rows() {
        std::vector<std::pair<uint64_t, int32_t>> fps;
        std::vector<std::pair<int32_t, double>> buf;
        auto load_row = [&](int64_t i,
                            std::vector<std::pair<int32_t, double>> &out) {
            out.clear();
            for (int64_t e : P.rowe[i]) {
                const Ent &en = P.ents[e];
                if (en.alive) out.push_back({en.c, en.v});
            }
            std::sort(out.begin(), out.end());
        };
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i] || P.rlen[i] < 2) continue;
            load_row(i, buf);
            if (std::fabs(buf[0].second) < 1e-300) continue;
            fps.push_back({pattern_fingerprint(buf), (int32_t)i});
        }
        // Sort is (fp, row index): within a bucket rows keep their original
        // order, so the merge target stays the FIRST row of each parallel
        // class exactly as the previous first-seen hash-map scheme.
        std::sort(fps.begin(), fps.end());
        bool changed = false;
        std::vector<std::pair<int64_t,
                              std::vector<std::pair<int32_t, double>>>> reps;
        for (size_t a = 0; a < fps.size();) {
            size_t b = a + 1;
            while (b < fps.size() && fps[b].first == fps[a].first) ++b;
            if (b - a < 2) { a = b; continue; }
            reps.clear();
            for (size_t t = a; t < b; ++t) {
                const int64_t i = fps[t].second;
                if (!P.ralive[i]) continue;
                load_row(i, buf);
                int64_t i1 = -1;
                for (const auto &rep : reps)
                    if (patterns_parallel(rep.second, buf)) {
                        i1 = rep.first;
                        break;
                    }
                if (i1 < 0) {
                    reps.push_back({i, buf});
                    continue;
                }
                // Row i parallel to row i1: a_i = s * a_i1.
                const double v0 = buf[0].second;
                double v0_1 = 0.0;
                for (int64_t e : P.rowe[i1]) {
                    const Ent &en = P.ents[e];
                    if (en.alive && en.c == buf[0].first) {
                        v0_1 = en.v;
                        break;
                    }
                }
                if (std::fabs(v0_1) < 1e-300) continue;
                const double s = v0 / v0_1;
                // Row i's bounds in row-i1 units.
                double lo2 = (s > 0 ? P.AL[i] : P.AU[i]) / s;
                double up2 = (s > 0 ? P.AU[i] : P.AL[i]) / s;
                Rec r;
                r.type = RecType::ParallelRow;
                r.i = (int32_t)i1;
                r.j = (int32_t)i;
                r.a = s;
                r.d0 = P.AL[i1];
                r.d1 = P.AU[i1];
                uint8_t lo_from_2 = 0, up_from_2 = 0;
                if (lo2 > P.AL[i1]) { P.AL[i1] = lo2; lo_from_2 = 1; }
                if (up2 < P.AU[i1]) { P.AU[i1] = up2; up_from_2 = 1; }
                r.flag = (uint8_t)(lo_from_2 | (up_from_2 << 1));
                if (infeas(P.AL[i1] > P.AU[i1] + tol)) return changed;
                log.push_back(std::move(r));
                remove_row_only(i, RecType::RedundantRow);
                // Pop the RedundantRow marker: ParallelRow's own replay
                // sets y_i from the merged dual, so the marker must not
                // zero it afterwards.  (remove_row_only pushed it last.)
                log.pop_back();
                changed = true;
            }
            a = b;
        }
        return changed;
    }

    // Tighten one side of x_k's box to the implied bound from row i,
    // recording a BoundChange with the row snapshot so postsolve can
    // transfer the bound multiplier to y_i (parity: PSLP
    // BOUND_CHANGE_THE_ROW, src/core/Postsolver.c:350-414, 802-820).
    void install_bound(int64_t i, int64_t k, double a, bool upper_side,
                       double newb) {
        Rec r;
        r.type = RecType::BoundChange;
        r.i = (int32_t)i;
        r.j = (int32_t)k;
        r.a = a;
        r.flag = upper_side ? 1 : 0;
        r.d0 = newb;                              // installed bound
        r.d1 = upper_side ? P.l[k] : P.u[k];      // other side (original)
        r.b = upper_side ? P.u[k] : P.l[k];       // old changed-side bound
        for (int64_t e : P.rowe[i]) {
            const Ent &en = P.ents[e];
            if (!en.alive) continue;
            r.idx.push_back(en.c);
            r.val.push_back(en.v);
        }
        log.push_back(std::move(r));
        (upper_side ? P.u[k] : P.l[k]) = newb;
        P.touch_col(k);
        stats.bounds_tightened++;
    }

    // Primal propagation with INSTALLED bounds (parity: PSLP
    // Primal_propagation.c, one round per row per pass).  Residual-activity
    // implied bounds on each variable in a row either prove infeasibility,
    // fix the variable at its own bound, or tighten its box (recorded as
    // BoundChange; the reference pays the same dual-postsolve price with
    // BOUND_CHANGE records, include/core/Postsolver.h:50-51).  Installed
    // bounds feed every later reduction: activity rows, dual fixing,
    // doubleton bound translation, implied-free tests.
    bool pass_primal_propagation() {
        bool changed = false;
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i] || P.rlen[i] < 2) continue;
            ensure_activity(i);
            // Snapshot: installs from this row leave the snapshot stale
            // within the row, exactly as the recompute-per-row original
            // (the cache itself is invalidated by touch_col).
            const double amin = P.act_min[i], amax = P.act_max[i];
            const int32_t inf_min = P.act_ninf_min[i];
            const int32_t inf_max = P.act_ninf_max[i];
            for (int64_t e : P.rowe[i]) {
                const Ent &en = P.ents[e];
                if (!en.alive) continue;
                const int64_t k = en.c;
                const double a = en.v;
                const double lo = P.l[k], up = P.u[k];
                // Residual activities excluding k's own contribution.
                const bool k_inf_min = (a > 0 ? lo == -INF : up == INF);
                const bool k_inf_max = (a > 0 ? up == INF : lo == -INF);
                const bool have_rmin = inf_min - (k_inf_min ? 1 : 0) == 0;
                const bool have_rmax = inf_max - (k_inf_max ? 1 : 0) == 0;
                const double rest_min = amin - (k_inf_min ? 0.0
                                        : (a > 0 ? a * lo : a * up));
                const double rest_max = amax - (k_inf_max ? 0.0
                                        : (a > 0 ? a * up : a * lo));
                // Implied box for x_k from the row's two sides.
                double iu = INF, il = -INF;
                if (a > 0) {
                    if (have_rmin && std::isfinite(P.AU[i]))
                        iu = (P.AU[i] - rest_min) / a;
                    if (have_rmax && std::isfinite(P.AL[i]))
                        il = (P.AL[i] - rest_max) / a;
                } else {
                    if (have_rmin && std::isfinite(P.AU[i]))
                        il = (P.AU[i] - rest_min) / a;
                    if (have_rmax && std::isfinite(P.AL[i]))
                        iu = (P.AL[i] - rest_max) / a;
                }
                if (infeas(std::isfinite(lo) && iu < lo - tol))
                    return changed;
                if (infeas(std::isfinite(up) && il > up + tol))
                    return changed;
                // Fix at the variable's own bound when the implied bound
                // pins it there (y_i stays 0 — the row is slack-feasible
                // at that point; same pragmatic choice as PSLP).
                if (std::isfinite(lo) && iu <= lo + tol && up > lo) {
                    fix_col(k, lo);
                    changed = true;
                    break;  // activities stale; next row
                }
                if (std::isfinite(up) && il >= up - tol && lo < up) {
                    fix_col(k, up);
                    changed = true;
                    break;
                }
                // Install meaningfully tighter bounds: replace an infinite
                // bound, or cut a finite one by >= 0.1% (Gurobi-style
                // usefulness filter; avoids endless micro-tightening).
                // Huge implied bounds (>1e15) are noise — skip.
                if (iu != INF && std::fabs(iu) < 1e15 && iu < up &&
                    (up == INF || up - iu > 1e-3 * std::max(1.0,
                                                            std::fabs(up)))) {
                    install_bound(i, k, a, /*upper_side=*/true, iu);
                    changed = true;
                }
                if (il != -INF && std::fabs(il) < 1e15 && il > P.l[k] &&
                    (P.l[k] == -INF ||
                     il - P.l[k] > 1e-3 * std::max(1.0,
                                                   std::fabs(P.l[k])))) {
                    install_bound(i, k, a, /*upper_side=*/false, il);
                    changed = true;
                }
            }
        }
        return changed;
    }

    // Parallel columns: A_:,k = s * A_:,j with c_k = s * c_j.  Merge into
    // one variable w = x_j + s x_k with summed (sign-aware) bounds; the
    // postsolve splits w back and sets z_j = z_w, z_k = s z_w (always
    // stationarity- and sign-consistent since the columns are parallel).
    bool pass_parallel_cols() {
        std::vector<std::pair<uint64_t, int32_t>> fps;
        std::vector<std::pair<int32_t, double>> buf;
        auto load_col = [&](int64_t k,
                            std::vector<std::pair<int32_t, double>> &out) {
            out.clear();
            for (int64_t e : P.cole[k]) {
                const Ent &en = P.ents[e];
                if (en.alive) out.push_back({en.r, en.v});
            }
            std::sort(out.begin(), out.end());
        };
        for (int64_t k = 0; k < P.n; ++k) {
            if (!P.calive[k] || P.clen[k] < 1) continue;
            load_col(k, buf);
            if (std::fabs(buf[0].second) < 1e-300) continue;
            fps.push_back({pattern_fingerprint(buf), (int32_t)k});
        }
        std::sort(fps.begin(), fps.end());
        bool changed = false;
        std::vector<std::pair<int64_t,
                              std::vector<std::pair<int32_t, double>>>> reps;
        for (size_t a = 0; a < fps.size();) {
            size_t b = a + 1;
            while (b < fps.size() && fps[b].first == fps[a].first) ++b;
            if (b - a < 2) { a = b; continue; }
            reps.clear();
            for (size_t t = a; t < b; ++t) {
                const int64_t k = fps[t].second;
                if (!P.calive[k]) continue;
                load_col(k, buf);
                int64_t j = -1;
                for (const auto &rep : reps)
                    if (patterns_parallel(rep.second, buf)) {
                        j = rep.first;
                        break;
                    }
                if (j < 0) {
                    reps.push_back({k, buf});
                    continue;
                }
                // Ratio s with A_k = s * A_j.
                const double v0 = buf[0].second;
                double v0_j = 0.0;
                for (int64_t e : P.cole[j]) {
                    const Ent &en = P.ents[e];
                    if (en.alive && en.r == buf[0].first) {
                        v0_j = en.v;
                        break;
                    }
                }
                if (std::fabs(v0_j) < 1e-300) continue;
                const double s = v0 / v0_j;
                // Costs must be in the same ratio (a mismatch neither
                // merges nor replaces the representative, as before).
                if (std::fabs(P.c[k] - s * P.c[j]) >
                    1e-10 * std::max(1.0, std::fabs(P.c[k])))
                    continue;
                Rec r;
                r.type = RecType::ParallelCol;
                r.j = (int32_t)j;
                r.i = (int32_t)k;  // merged-away column
                r.a = s;
                r.val = {P.l[j], P.u[j], P.l[k], P.u[k]};
                // w = x_j + s x_k bounds (sign-aware, inf-propagating).
                const double lo_k = s > 0 ? s * P.l[k] : s * P.u[k];
                const double up_k = s > 0 ? s * P.u[k] : s * P.l[k];
                P.l[j] = P.l[j] + lo_k;
                P.u[j] = P.u[j] + up_k;
                P.touch_col(j);
                log.push_back(std::move(r));
                for (int64_t e : P.cole[k]) {
                    if (P.ents[e].alive) {
                        P.kill_entry(e);
                        stats.nnz_removed++;
                    }
                }
                P.calive[k] = 0;
                stats.cols_removed++;
                changed = true;
            }
            a = b;
        }
        return changed;
    }

    // ---- invariant checker (opt-in debug mode) --------------------------
    // Parity: PSLP's Debugger.c (include/core/Debugger.h:37-60), which the
    // reference EXCLUDES from its embedded build (CMakeLists.txt:98); here
    // it is a runtime flag so the property tests can run every pass
    // checked.  A violation aborts presolve with HPRES_ERROR, which the
    // integration layer treats like any other failure (solve unreduced).

    bool debug_checks = false;
    const char *invariant_error = nullptr;

    const char *check_invariants_impl() {
        std::vector<int64_t> rl(P.m, 0), cl(P.n, 0);
        int64_t live = 0;
        for (const Ent &e : P.ents) {
            if (!e.alive) continue;
            if (e.r < 0 || e.r >= P.m || e.c < 0 || e.c >= P.n)
                return "entry index out of range";
            if (!P.ralive[e.r]) return "live entry in dead row";
            if (!P.calive[e.c]) return "live entry in dead column";
            if (!std::isfinite(e.v)) return "non-finite coefficient";
            rl[e.r]++;
            cl[e.c]++;
            live++;
        }
        if (live != P.live_entries) return "live-entry count drifted";
        for (int64_t i = 0; i < P.m; ++i) {
            if (P.ralive[i] && rl[i] != P.rlen[i])
                return "row live-count mismatch";
            if (P.ralive[i]) {
                if (std::isnan(P.AL[i]) || std::isnan(P.AU[i]))
                    return "NaN row bound";
                if (P.AL[i] > P.AU[i] + tol)
                    return "crossed row bounds without INFEASIBLE";
            }
        }
        for (int64_t j = 0; j < P.n; ++j) {
            if (P.calive[j] && cl[j] != P.clen[j])
                return "column live-count mismatch";
            if (P.calive[j]) {
                if (std::isnan(P.l[j]) || std::isnan(P.u[j]) ||
                    std::isnan(P.c[j]))
                    return "NaN column data";
                if (P.l[j] > P.u[j] + tol)
                    return "crossed column bounds without INFEASIBLE";
            }
        }
        for (int64_t i = 0; i < P.m; ++i) {
            if (P.act_ok.empty() || !P.act_ok[i] || !P.ralive[i]) continue;
            double amin = 0.0, amax = 0.0;
            int32_t inf_min = 0, inf_max = 0;
            for (int64_t e : P.rowe[i]) {
                const Ent &en = P.ents[e];
                if (!en.alive) continue;
                const double lo = P.l[en.c], up = P.u[en.c];
                if (en.v > 0) {
                    if (lo == -INF) inf_min++; else amin += en.v * lo;
                    if (up == INF) inf_max++; else amax += en.v * up;
                } else {
                    if (up == INF) inf_min++; else amin += en.v * up;
                    if (lo == -INF) inf_max++; else amax += en.v * lo;
                }
            }
            if (inf_min != P.act_ninf_min[i] || inf_max != P.act_ninf_max[i])
                return "cached activity inf-count stale without dirty mark";
            const double sc = std::max({1.0, std::fabs(amin),
                                        std::fabs(amax)});
            if (std::fabs(amin - P.act_min[i]) > 1e-9 * sc ||
                std::fabs(amax - P.act_max[i]) > 1e-9 * sc)
                return "cached activity value stale without dirty mark";
        }
        for (const Rec &r : log) {
            // Field conventions: i is a row and j a column for every
            // type EXCEPT ParallelRow (j = removed ROW) and ParallelCol
            // (i = merged-away COLUMN); validating those against the
            // other dimension would spuriously abort presolve on
            // rectangular problems.
            int64_t imax = (r.type == RecType::ParallelCol) ? P.n : P.m;
            int64_t jmax = (r.type == RecType::ParallelRow) ? P.m : P.n;
            if (r.i >= (int32_t)imax || r.j >= (int32_t)jmax)
                return "log record index out of range";
            for (int32_t t : r.idx)
                if (t < 0 || (t >= P.m && t >= P.n))
                    return "log snapshot index out of range";
        }
        return nullptr;
    }

    // True if presolve should stop (invariant broken).
    bool check_failed(const char *where) {
        if (!debug_checks || status != HPRES_OK) return status != HPRES_OK;
        const char *err = check_invariants_impl();
        if (err) {
            invariant_error = err;
            (void)where;
            status = HPRES_ERROR;
            return true;
        }
        return false;
    }

    // ---- driver ---------------------------------------------------------
    // FAST/MEDIUM phase alternation (parity: PSLP Presolver.c:52-53,
    // :643-748): cheap local reductions loop while they keep removing
    // >5% of the remaining nonzeros, then one sweep of the quadratic-ish
    // explorers; a cycle that removes <5% (after a warm-up) or the
    // wall-clock budget ends the run.  Unlike the reference's fixed 60 s
    // the budget is a parameter (hpres_presolve_ex), defaulting to 60 s.

    template <typename F>
    bool timed_pass(int idx, F &&fn) {
        const auto t0 = std::chrono::steady_clock::now();
        const bool ch = fn();
        stats.explorer_s[idx] += std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        return ch;
    }

    bool run_fast_phase() {
        bool ch = false;
        ch |= timed_pass(0, [&] { return pass_empty_and_singleton_rows(); });
        if (check_failed("singleton_rows")) return ch;
        ch |= timed_pass(1, [&] { return pass_fixed_and_empty_cols(); });
        if (check_failed("fixed_cols")) return ch;
        ch |= timed_pass(2, [&] { return pass_free_singleton_cols(); });
        if (check_failed("free_ston_cols")) return ch;
        ch |= timed_pass(3, [&] { return pass_doubleton_eq(); });
        if (check_failed("doubleton_eq")) return ch;
        ch |= timed_pass(4, [&] { return pass_dual_fix(); });
        check_failed("dual_fix");
        return ch;
    }

    bool run_medium_phase() {
        bool ch = false;
        ch |= timed_pass(5, [&] { return pass_activity_rows(); });
        if (check_failed("activity_rows")) return ch;
        ch |= timed_pass(6, [&] { return pass_primal_propagation(); });
        if (check_failed("propagation")) return ch;
        ch |= timed_pass(7, [&] { return pass_parallel_rows(); });
        if (check_failed("parallel_rows")) return ch;
        ch |= timed_pass(8, [&] { return pass_parallel_cols(); });
        check_failed("parallel_cols");
        return ch;
    }

    // Compact the entry storage when dead entries dominate: the in-place
    // reduction style leaves killed entries in rowe/cole (round-1 weak
    // spot for 10M+-nnz problems — every pass scans the dead ones too).
    void maybe_compact() {
        const int64_t total = (int64_t)P.ents.size();
        if (total < 100000 || P.live_entries * 2 > total) return;
        std::vector<Ent> ents;
        ents.reserve(P.live_entries);
        for (auto &rv : P.rowe) rv.clear();
        for (auto &cv : P.cole) cv.clear();
        for (const Ent &e : P.ents) {
            if (!e.alive) continue;
            int64_t id = (int64_t)ents.size();
            ents.push_back(e);
            P.rowe[e.r].push_back(id);
            P.cole[e.c].push_back(id);
        }
        P.ents.swap(ents);
    }

    void run(int max_rounds, double max_time, bool debug) {
        debug_checks = debug;
        P.act_min.assign(P.m, 0.0);
        P.act_max.assign(P.m, 0.0);
        P.act_ninf_min.assign(P.m, 0);
        P.act_ninf_max.assign(P.m, 0);
        P.act_ok.assign(P.m, 0);
        if (max_rounds <= 0) max_rounds = 16;
        if (max_time <= 0.0) max_time = 60.0;
        const auto t0 = std::chrono::steady_clock::now();
        auto elapsed = [&] {
            return std::chrono::duration<double>(
                       std::chrono::steady_clock::now() - t0).count();
        };
        for (int round = 0; round < max_rounds; ++round) {
            stats.rounds = round + 1;
            const int64_t cycle0 = P.live_entries;
            bool changed = false;
            // FAST loop: repeat while it cuts >5% of the remaining nnz.
            while (true) {
                const int64_t before = P.live_entries;
                const bool ch = run_fast_phase();
                changed |= ch;
                if (status != HPRES_OK) return;
                if (!ch || elapsed() > max_time) break;
                if (before - P.live_entries <=
                    (int64_t)(0.05 * (double)std::max<int64_t>(before, 1)))
                    break;
            }
            if (elapsed() > max_time) break;
            changed |= run_medium_phase();
            if (status != HPRES_OK) return;
            if (!changed) break;
            if (elapsed() > max_time) break;
            const int64_t cut = cycle0 - P.live_entries;
            if (round >= 2 &&
                cut < (int64_t)(0.05 * (double)std::max<int64_t>(cycle0, 1)))
                break;
            maybe_compact();
        }
        stats.time_s = elapsed();
        compact();
    }

    void compact() {
        std::vector<int64_t> rpos(P.m, -1), cpos(P.n, -1);
        for (int64_t i = 0; i < P.m; ++i)
            if (P.ralive[i]) {
                rpos[i] = red_m++;
                row_map.push_back(i);
            }
        for (int64_t j = 0; j < P.n; ++j)
            if (P.calive[j]) {
                cpos[j] = red_n++;
                col_map.push_back(j);
            }
        red_Ap.assign(red_m + 1, 0);
        std::vector<std::pair<int32_t, double>> buf;
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i]) continue;
            int64_t cnt = 0;
            for (int64_t e : P.rowe[i]) cnt += P.ents[e].alive;
            red_Ap[rpos[i] + 1] = cnt;
        }
        for (int64_t i = 0; i < red_m; ++i) red_Ap[i + 1] += red_Ap[i];
        red_Ai.resize(red_Ap[red_m]);
        red_Ax.resize(red_Ap[red_m]);
        for (int64_t i = 0; i < P.m; ++i) {
            if (!P.ralive[i]) continue;
            buf.clear();
            for (int64_t e : P.rowe[i]) {
                const Ent &en = P.ents[e];
                if (en.alive) buf.push_back({(int32_t)cpos[en.c], en.v});
            }
            std::sort(buf.begin(), buf.end());
            int64_t o = red_Ap[rpos[i]];
            for (auto &[cc, vv] : buf) {
                red_Ai[o] = cc;
                red_Ax[o] = vv;
                ++o;
            }
        }
        for (int64_t i : row_map) {
            red_AL.push_back(P.AL[i]);
            red_AU.push_back(P.AU[i]);
        }
        for (int64_t j : col_map) {
            red_l.push_back(P.l[j]);
            red_u.push_back(P.u[j]);
            red_c.push_back(P.c[j]);
        }
    }

    // ---- postsolve ------------------------------------------------------

    void postsolve(const double *x_red, const double *y_red,
                   const double *z_red, double *x, double *y,
                   double *z) const {
        std::fill(x, x + P.n, 0.0);
        std::fill(y, y + P.m, 0.0);
        std::fill(z, z + P.n, 0.0);
        for (int64_t k = 0; k < red_n; ++k) {
            x[col_map[k]] = x_red[k];
            z[col_map[k]] = z_red[k];
        }
        for (int64_t k = 0; k < red_m; ++k) y[row_map[k]] = y_red[k];

        for (auto it = log.rbegin(); it != log.rend(); ++it) {
            const Rec &r = *it;
            switch (r.type) {
                case RecType::EmptyRow:
                case RecType::RedundantRow:
                    y[r.i] = 0.0;
                    break;
                case RecType::SingletonRow: {
                    // z_j was computed against the tightened bounds; if the
                    // active bound came from this row, transfer it to y_i.
                    const double zj = z[r.j];
                    const bool lo_from_row = r.flag & 1;
                    const bool up_from_row = r.flag & 2;
                    double yi = 0.0;
                    if (zj > 0 && lo_from_row) {
                        yi = zj / r.a;
                        z[r.j] = 0.0;
                    } else if (zj < 0 && up_from_row) {
                        yi = zj / r.a;
                        z[r.j] = 0.0;
                    }
                    y[r.i] = yi;
                    break;
                }
                case RecType::ForcingRow: {
                    // All cols were fixed (replayed already, with y_i = 0).
                    // Pick the extremal dual keeping every z sign valid,
                    // then shift the fixed columns' z by a_ik * y_i.
                    double yi = 0.0;
                    bool first = true;
                    for (size_t k = 0; k < r.idx.size(); ++k) {
                        const double ratio = z[r.idx[k]] / r.val[k];
                        if (first) { yi = ratio; first = false; }
                        else if (r.flag) yi = std::min(yi, ratio);
                        else yi = std::max(yi, ratio);
                    }
                    if (r.flag) yi = std::min(yi, 0.0);  // row at AU: y <= 0
                    else yi = std::max(yi, 0.0);         // row at AL: y >= 0
                    y[r.i] = yi;
                    for (size_t k = 0; k < r.idx.size(); ++k)
                        z[r.idx[k]] -= r.val[k] * yi;
                    break;
                }
                case RecType::ParallelRow: {
                    // y[r.i] currently holds the merged dual.  Split it to
                    // the row whose bound is binding.
                    const double ym = y[r.i];
                    const bool lo_from_2 = r.flag & 1;
                    const bool up_from_2 = r.flag & 2;
                    double y1 = ym, y2 = 0.0;
                    if (ym > 0 && lo_from_2) { y1 = 0.0; y2 = ym / r.a; }
                    else if (ym < 0 && up_from_2) { y1 = 0.0; y2 = ym / r.a; }
                    y[r.i] = y1;
                    y[r.j] = y2;
                    break;
                }
                case RecType::FixedCol: {
                    x[r.j] = r.a;
                    double zj = r.b;  // cost at fix time
                    for (size_t k = 0; k < r.idx.size(); ++k)
                        zj -= r.val[k] * y[r.idx[k]];
                    z[r.j] = zj;
                    break;
                }
                case RecType::DoubletonEq: {
                    // a x_j + b x_k = d0; idx[0] = k; val[0..3] = l_j,
                    // u_j, old l_k, old u_k; then (row, a_rj) snapshot.
                    const int64_t k = r.idx[0];
                    const double aj = r.a, ak = r.b, rhs = r.d0;
                    const double lj = r.val[0], uj = r.val[1];
                    const double lk = r.val[2], uk = r.val[3];
                    const double xk = x[k];
                    const double xj = (rhs - ak * xk) / aj;
                    x[r.j] = xj;
                    // Split the reduced z_k into (z_j, z_k) using
                    // z_k_reduced = z_k - (ak/aj) z_j and complementarity.
                    const double ztol = 1e-10;
                    const double sc = std::max({1.0, std::fabs(xj),
                                                std::fabs(xk)});
                    const bool j_at_lo = std::isfinite(lj) &&
                                         xj <= lj + 1e-7 * sc;
                    const bool j_at_up = std::isfinite(uj) &&
                                         xj >= uj - 1e-7 * sc;
                    const bool k_at_own = (std::isfinite(lk) &&
                                           xk <= lk + 1e-7 * sc) ||
                                          (std::isfinite(uk) &&
                                           xk >= uk - 1e-7 * sc);
                    double zj = 0.0;
                    if ((j_at_lo || j_at_up) && std::fabs(z[k]) > ztol) {
                        const double zj_cand = -(aj / ak) * z[k];
                        const bool sign_ok = (j_at_lo && zj_cand >= -ztol) ||
                                             (j_at_up && zj_cand <= ztol);
                        if (sign_ok && !k_at_own) {
                            zj = zj_cand;
                            z[k] = 0.0;
                        } else if (sign_ok && k_at_own) {
                            // Degenerate: keep z on whichever bound gives a
                            // valid sign for z_k; if z_k already valid,
                            // leave it there.
                            const bool k_lo = std::isfinite(lk) &&
                                              xk <= lk + 1e-7 * sc;
                            const bool zk_ok = (k_lo && z[k] >= -ztol) ||
                                               (!k_lo && z[k] <= ztol);
                            if (!zk_ok) {
                                zj = zj_cand;
                                z[k] = 0.0;
                            }
                        }
                    }
                    z[r.j] = zj;
                    // y_i from x_j's stationarity (c_j at reduction time).
                    double acc = r.d1 - zj;
                    for (size_t t = 4; t < r.val.size(); ++t)
                        acc -= r.val[t] * y[r.idx[t - 3]];
                    y[r.i] = acc / aj;
                    break;
                }
                case RecType::ParallelCol: {
                    // w = x_j + s x_k; val = [l_j, u_j, l_k, u_k].
                    const int64_t k = r.i;
                    const double s = r.a;
                    const double lj = r.val[0], uj = r.val[1];
                    const double lk = r.val[2], uk = r.val[3];
                    const double w = x[r.j];
                    // Feasible split interval for x_j given x_k's box.
                    const double lo_x = std::max(
                        lj, s > 0 ? w - s * uk : w - s * lk);
                    const double hi_x = std::min(
                        uj, s > 0 ? w - s * lk : w - s * uk);
                    // Any point works (the interval collapses whenever a
                    // w-bound is active); anchor at 0 clipped in.
                    const double xj = std::min(std::max(0.0, lo_x), hi_x);
                    x[r.j] = xj;
                    x[k] = (w - xj) / s;
                    z[k] = s * z[r.j];
                    break;
                }
                case RecType::BoundChange: {
                    // Installed bound from row i (reverse of
                    // install_bound).  If the reduced solution rests on the
                    // IMPLIED bound with a multiplier, that multiplier
                    // really belongs to row i: transfer z_j/a_ij to y_i and
                    // restore stationarity of the other row-i columns
                    // (parity: PSLP retrieve_bound_change,
                    // src/core/Postsolver.c:350-414).
                    const double xj = x[r.j];
                    const double zj = z[r.j];
                    const double sc = std::max(1.0, std::fabs(xj));
                    const bool changed_upper = r.flag & 1;
                    // x_j at its surviving original bound with a
                    // sign-valid multiplier: nothing to fix.
                    if (std::isfinite(r.d1) &&
                        std::fabs(xj - r.d1) <= 1e-7 * sc) {
                        const bool other_is_lower = changed_upper;
                        if ((other_is_lower && zj >= 0) ||
                            (!other_is_lower && zj <= 0))
                            break;
                    }
                    // Implied bound not active, or no multiplier: no-op.
                    if (std::fabs(xj - r.d0) > 1e-7 * sc || zj == 0.0)
                        break;
                    y[r.i] += zj / r.a;
                    for (size_t t = 0; t < r.idx.size(); ++t) {
                        if (r.idx[t] == r.j) continue;
                        z[r.idx[t]] -= (r.val[t] / r.a) * zj;
                    }
                    z[r.j] = 0.0;
                    break;
                }
                case RecType::FreeSingletonCol: {
                    // x_j = (r* - sum_k a_ik x_k) / a;  y_i = c_j / a.
                    double s = r.d0;
                    for (size_t k = 0; k < r.idx.size(); ++k)
                        s -= r.val[k] * x[r.idx[k]];
                    x[r.j] = s / r.a;
                    y[r.i] = r.b / r.a;
                    z[r.j] = 0.0;
                    break;
                }
                case RecType::FixColInf: {
                    // Least-extreme x_j satisfying the deleted rows'
                    // finite sides (their duals stay 0; z_j = 0 since
                    // c_j == 0 and no dual contributions remain).
                    const bool pos = r.flag != 0;
                    double ext = r.d0;
                    size_t ii = 1, vi = 0;
                    const int32_t nrows = r.idx[0];
                    for (int32_t t = 0; t < nrows; ++t) {
                        const int32_t len = r.idx[ii];
                        const double side = r.val[vi];
                        double rest = 0.0, coeff = 0.0;
                        for (int32_t k = 0; k < len; ++k) {
                            const int32_t cidx = r.idx[ii + 1 + k];
                            const double v = r.val[vi + 1 + k];
                            if (cidx == r.j) coeff = v;
                            else rest += v * x[cidx];
                        }
                        if (coeff != 0.0) {
                            const double val = (side - rest) / coeff;
                            ext = pos ? std::max(ext, val)
                                      : std::min(ext, val);
                        }
                        ii += len + 1;
                        vi += len + 1;
                    }
                    x[r.j] = std::isfinite(ext) ? ext : 0.0;
                    z[r.j] = 0.0;
                    break;
                }
                case RecType::EqToIneq: {
                    // x_j from the original equality; z_j from the REDUCED
                    // inequality dual, then shift y_i by c_j/a — original
                    // stationarity for every other row-i column follows
                    // because their costs absorbed -(c_j/a) a_ik at
                    // reduction time (parity: PSLP retrieve_sub_col with
                    // ck=0 + retrieve_eq_to_ineq,
                    // src/core/Postsolver.c:133-157, :476-480).
                    double s = r.d0;
                    for (size_t k = 0; k < r.idx.size(); ++k)
                        s -= r.val[k] * x[r.idx[k]];
                    x[r.j] = s / r.a;
                    z[r.j] = -r.a * y[r.i];
                    y[r.i] += r.b / r.a;
                    break;
                }
            }
        }
    }
};

}  // namespace

struct hpres_handle {
    Presolver ps;
};

extern "C" {

hpres_handle *hpres_presolve_ex(int64_t m, int64_t n, const int64_t *Ap,
                                const int32_t *Ai, const double *Ax,
                                const double *AL, const double *AU,
                                const double *l, const double *u,
                                const double *c, double feas_tol,
                                int max_rounds, double max_time,
                                int debug_checks) {
    auto *h = new hpres_handle();
    Presolver &ps = h->ps;
    ps.tol = feas_tol > 0 ? feas_tol : 1e-8;
    Problem &P = ps.P;
    P.m = m;
    P.n = n;
    P.AL.assign(AL, AL + m);
    P.AU.assign(AU, AU + m);
    P.l.assign(l, l + n);
    P.u.assign(u, u + n);
    P.c.assign(c, c + n);
    P.ralive.assign(m, 1);
    P.calive.assign(n, 1);
    P.rowe.resize(m);
    P.cole.resize(n);
    P.rlen.assign(m, 0);
    P.clen.assign(n, 0);
    const int64_t nnz = Ap[m];
    P.ents.reserve(nnz);
    // Exact per-row/col reserves: without them the ~2*nnz geometric
    // small-vector growths (plus their allocator traffic) dominate the
    // build at 10M+ nnz — the explorer loop was 2.8 s of a 26 s presolve
    // wall at 20M nnz before this.
    {
        std::vector<int64_t> ccount(n, 0);
        for (int64_t e = 0; e < nnz; ++e) ccount[Ai[e]]++;
        for (int64_t j = 0; j < n; ++j) P.cole[j].reserve(ccount[j]);
        for (int64_t i = 0; i < m; ++i) P.rowe[i].reserve(Ap[i + 1] - Ap[i]);
    }
    for (int64_t i = 0; i < m; ++i) {
        for (int64_t e = Ap[i]; e < Ap[i + 1]; ++e) {
            if (Ax[e] == 0.0) continue;  // drop explicit zeros
            P.add_entry(i, Ai[e], Ax[e]);
        }
    }
    ps.run(max_rounds, max_time, debug_checks != 0);
    return h;
}

hpres_handle *hpres_presolve(int64_t m, int64_t n, const int64_t *Ap,
                             const int32_t *Ai, const double *Ax,
                             const double *AL, const double *AU,
                             const double *l, const double *u,
                             const double *c, double feas_tol,
                             int max_rounds) {
    return hpres_presolve_ex(m, n, Ap, Ai, Ax, AL, AU, l, u, c, feas_tol,
                             max_rounds, /*max_time=*/0.0,
                             /*debug_checks=*/0);
}

int hpres_status(const hpres_handle *h) { return h->ps.status; }
int64_t hpres_reduced_m(const hpres_handle *h) { return h->ps.red_m; }
int64_t hpres_reduced_n(const hpres_handle *h) { return h->ps.red_n; }
int64_t hpres_reduced_nnz(const hpres_handle *h) {
    return (int64_t)h->ps.red_Ax.size();
}
double hpres_obj_shift(const hpres_handle *h) { return h->ps.P.obj_shift; }

void hpres_get_reduced(const hpres_handle *h, int64_t *Ap, int32_t *Ai,
                       double *Ax, double *AL, double *AU, double *l,
                       double *u, double *c) {
    const Presolver &ps = h->ps;
    std::memcpy(Ap, ps.red_Ap.data(), sizeof(int64_t) * (ps.red_m + 1));
    std::memcpy(Ai, ps.red_Ai.data(), sizeof(int32_t) * ps.red_Ai.size());
    std::memcpy(Ax, ps.red_Ax.data(), sizeof(double) * ps.red_Ax.size());
    std::memcpy(AL, ps.red_AL.data(), sizeof(double) * ps.red_m);
    std::memcpy(AU, ps.red_AU.data(), sizeof(double) * ps.red_m);
    std::memcpy(l, ps.red_l.data(), sizeof(double) * ps.red_n);
    std::memcpy(u, ps.red_u.data(), sizeof(double) * ps.red_n);
    std::memcpy(c, ps.red_c.data(), sizeof(double) * ps.red_n);
}

void hpres_get_maps(const hpres_handle *h, int64_t *row_map,
                    int64_t *col_map) {
    const auto &ps = h->ps;
    std::copy(ps.row_map.begin(), ps.row_map.end(), row_map);
    std::copy(ps.col_map.begin(), ps.col_map.end(), col_map);
}

void hpres_postsolve(const hpres_handle *h, const double *x_red,
                     const double *y_red, const double *z_red, double *x,
                     double *y, double *z) {
    h->ps.postsolve(x_red, y_red, z_red, x, y, z);
}

void hpres_stats(const hpres_handle *h, int64_t *rows_removed,
                 int64_t *cols_removed, int64_t *nnz_removed,
                 int64_t *rounds) {
    *rows_removed = h->ps.stats.rows_removed;
    *cols_removed = h->ps.stats.cols_removed;
    *nnz_removed = h->ps.stats.nnz_removed;
    *rounds = h->ps.stats.rounds;
}

/* Per-explorer wall-time report + bound-tightening count (parity:
 * PSLP per-explorer stats, PSLP_stats.h:46-56).  Writes a
 * newline-separated "name seconds" table into buf (truncated to
 * buflen); returns the number of bytes that would have been written. */
int64_t hpres_report(const hpres_handle *h, char *buf, int64_t buflen) {
    std::string out;
    char line[96];
    const Stats &st = h->ps.stats;
    for (int i = 0; i < Stats::N_EXPLORERS; ++i) {
        std::snprintf(line, sizeof(line), "%s %.6f\n",
                      Stats::explorer_name(i), st.explorer_s[i]);
        out += line;
    }
    std::snprintf(line, sizeof(line), "bounds_tightened %lld\n",
                  (long long)st.bounds_tightened);
    out += line;
    std::snprintf(line, sizeof(line), "total_time %.6f\n", st.time_s);
    out += line;
    if (buf && buflen > 0) {
        const int64_t n = std::min<int64_t>((int64_t)out.size(),
                                            buflen - 1);
        std::memcpy(buf, out.data(), (size_t)n);
        buf[n] = '\0';
    }
    return (int64_t)out.size();
}

void hpres_free(hpres_handle *h) { delete h; }

}  // extern "C"
