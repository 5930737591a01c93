-- Deploy-time input (reference: itests/tests/kinesis/test_multi_worker_no_kinesis_errors,
-- scaled 50000->1000 rows): one bulk transaction through a kinesis sink with
-- KINESIS_ERROR_PROBABILITY=0.0 — the partial-retry path must deliver
-- every record exactly once into the poller capture.
CREATE TABLE customers (id serial primary key, first_name text, last_name text);

BEGIN;
INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(1,1000) AS x(id);
COMMIT;
