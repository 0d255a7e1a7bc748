"""Custom operators the engine adds on top of native Spark SQL.

Preference order per /opt/skills-guide and SURVEY.md §7: (1) compose
built-in DataFrame ops, (2) Arrow-batched Pandas UDFs, (3) mapPartitions.
Everything here is category (1) or (2) — no RDDs, no driver-side loops.
"""
