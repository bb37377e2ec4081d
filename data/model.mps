NAME          DEMO2X2
* min -3 x1 - 5 x2  s.t.  x1 + 2 x2 <= 10,  3 x1 + x2 <= 12,  x >= 0
* optimum: x = (2.8, 3.6), obj = -26.4
ROWS
 N  COST
 L  C1
 L  C2
COLUMNS
    X1        COST      -3.0       C1        1.0
    X1        C2        3.0
    X2        COST      -5.0       C1        2.0
    X2        C2        1.0
RHS
    RHS       C1        10.0       C2        12.0
BOUNDS
ENDATA
