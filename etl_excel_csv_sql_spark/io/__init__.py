"""Sources and sinks with the reference's file-lifecycle semantics.

- xlsx: minimal pure-stdlib .xlsx reader/writer (no openpyxl in the env)
- excel: Excel → DataFrame source (S1/S2: sheet catalog, header offset)
- csv_io: CSV source/sink with the reference's conflict/lock semantics (S3, K1-K3)
- settings: key=value settings-file catalog (S4, S6)
- jdbc: SQL full-refresh sink behind an interface + quarantine split (K4, T3)
"""
