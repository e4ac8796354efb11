-- Catalog DDL (SURVEY.md §3.3, entry point C — the Athena-surface analogue).
-- Semantic views over the registered base tables; installed by
-- sources.catalog.install_views(). Statements are ';'-separated.
-- Sum discipline matches the engine-wide rule: doubles sum through
-- DECIMAL(38,6) so distributed order never changes the answer.

CREATE OR REPLACE TEMP VIEW v_events_hourly AS
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type;

CREATE OR REPLACE TEMP VIEW v_customer_value AS
SELECT c.c_custkey,
       c.c_name,
       c.c_mktsegment,
       count(o.o_orderkey) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment;

CREATE OR REPLACE TEMP VIEW v_nation_trade AS
SELECT n.n_name AS nation,
       r.r_name AS region,
       count(DISTINCT s.s_suppkey) AS n_suppliers,
       count(DISTINCT c.c_custkey) AS n_customers
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, r.r_name
