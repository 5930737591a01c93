-- Deploy-time input (reference: itests/tests/kinesis/test_high_kinesis_errors,
-- scaled 2500->250 rows): one bulk transaction through a kinesis sink with
-- KINESIS_ERROR_PROBABILITY=0.4 — the partial-retry path must deliver
-- every record exactly once into the poller capture.
CREATE TABLE customers (id serial primary key, first_name text, last_name text);

BEGIN;
INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(1,250) AS x(id);
COMMIT;
