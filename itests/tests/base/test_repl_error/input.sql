-- Deploy-time input (reference: itests/tests/base/test_repl_error):
-- a mid-stream decode error (the reference provokes it with a
-- pglogical txn the output plugin cannot decode) must be skipped —
-- rows BEFORE and AFTER the error all land exactly once (S7).
CREATE TABLE customers (id serial PRIMARY KEY, first_name text, last_name text);
INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
-- ... undecodable transaction here (pglogical DDL) ...
SELECT pg_sleep(10);
INSERT INTO customers (first_name, last_name) VALUES ('Goodbye', 'World');
UPDATE customers SET last_name = 'Friends' WHERE id = 1;
DELETE FROM customers WHERE id = 2;
