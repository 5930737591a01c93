-- Deploy-time input (reference: itests/tests/base/test_timeout):
-- 15 single-row transactions separated by pg_sleep(4.5) against
-- BATCH_FLUSH_UPDATE_AGE=5000 / BATCH_FLUSH_MAX_AGE=75000 — batches
-- must flush on age, delivering every row exactly once, in order.
CREATE TABLE customers (id serial primary key, first_name text, last_name text);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
SELECT pg_sleep(4.5);
