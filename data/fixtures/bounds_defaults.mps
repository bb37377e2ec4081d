* Bound-card edge cases (reference mps_reader.cpp:893-933, :1156-1181):
* FR/MI/PL/BV/FX cards and the "UP with negative u and no LO => l=-inf"
* finalization rule.  min sum(c x) with known optimum -19.5:
*   XFR free (c=1, eq row pins it to 2)        -> +2
*   XMI l=-inf, u=+inf (c=2, row G: x >= -5)   -> -10
*   XBV binary relaxation [0,1] (c=-1)         -> -1
*   XFX fixed at 1.5 (c=-2)                    -> -3
*   XUPN u=-1 => l=-inf rule (c=1, G: x>=-7.5) -> -7.5
NAME          BOUNDSDEF
ROWS
 N  COST
 E  PIN1
 G  PIN2
 G  PIN3
COLUMNS
    XFR       COST      1.0        PIN1      1.0
    XMI       COST      2.0        PIN2      1.0
    XBV       COST      -1.0
    XFX       COST      -2.0
    XUPN      COST      1.0        PIN3      1.0
RHS
    RHS       PIN1      2.0        PIN2      -5.0
    RHS       PIN3      -7.5
BOUNDS
 FR BND       XFR
 MI BND       XMI
 BV BND       XBV
 FX BND       XFX       1.5
 UP BND       XUPN      -1.0
ENDATA
