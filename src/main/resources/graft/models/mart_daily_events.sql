-- graft: incremental partition=event_date
-- mart: daily event rollup, materialized INCREMENTALLY: on re-runs only
-- the newest existing day-partition and anything later is recomputed and
-- dynamically overwritten (older partitions are immutable by contract).
-- The runner pushes the partition bound into this lazy view, so the
-- recompute reads only the tail of the source at any scale.
SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
