-- Deploy-time input (reference: itests/tests/base/test_staggered):
-- transactions arriving with long gaps (pg_sleep between statements)
-- must all land exactly once across multiple drain micro-batches.
CREATE TABLE customers (first_name text, last_name text);
SELECT pg_sleep(6);
INSERT INTO customers (first_name, last_name) VALUES ('1', '1');
SELECT pg_sleep(2);
BEGIN;
INSERT INTO customers (first_name, last_name) VALUES ('2', '2');
SELECT pg_sleep(10);
INSERT INTO customers (first_name, last_name) VALUES ('3', '3');
COMMIT;
INSERT INTO customers (first_name, last_name) VALUES ('4', '4');
