* RANGES semantics across row types (committed fixture; reference rules:
* mps_reader.cpp:813-836 — L: [rhs-|R|, rhs]; G: [rhs, rhs+|R|];
* E with R>=0: [rhs, rhs+R]; E with R<0: [rhs+R, rhs]).
* Optimum: min -x1-x2-x3-x4 with each row binding at its upper end.
NAME          RANGESEDGE
ROWS
 N  COST
 L  RL
 G  RG
 E  REPOS
 E  RENEG
COLUMNS
    X1        COST      -1.0       RL        1.0
    X2        COST      -1.0       RG        1.0
    X3        COST      -1.0       REPOS     1.0
    X4        COST      -1.0       RENEG     1.0
RHS
    RHS       RL        8.0        RG        2.0
    RHS       REPOS     3.0        RENEG     5.0
RANGES
    RNG       RL        3.0        RG        4.0
    RNG       REPOS     2.0        RENEG     -1.5
BOUNDS
 UP BND       X1        100.0
 UP BND       X2        100.0
 UP BND       X3        100.0
 UP BND       X4        100.0
ENDATA
