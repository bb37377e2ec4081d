* Fixed-format fixture: row/column names CONTAIN SPACES (legal in the
* fixed dialect's column positions; reference mps_reader.cpp:360-554).
* min -3 x - 5 y  s.t.  "ROW A": x+2y <= 10, "ROW B": 3x+y <= 12
* optimum obj = -26.4 at (x, y) = (2.8, 3.6).
NAME          FIXED NAMES
ROWS
 N  OBJ ROW
 L  ROW A
 L  ROW B
COLUMNS
    VAR X     OBJ ROW   -3.0           ROW A     1.0
    VAR X     ROW B     3.0
    VAR Y     OBJ ROW   -5.0           ROW A     2.0
    VAR Y     ROW B     1.0
RHS
    RHS       ROW A     10.0           ROW B     12.0
ENDATA
