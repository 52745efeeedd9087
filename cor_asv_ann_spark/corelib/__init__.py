"""Pure-Python semantic core (no Spark imports).

Every function here is deterministic and unit-tested directly; the Spark
operators wrap these inside Arrow-batched pandas UDFs. This mirrors the
reference's lib/ vs wrapper/ split (/root/reference/ocrd_cor_asv_ann/lib).
"""
