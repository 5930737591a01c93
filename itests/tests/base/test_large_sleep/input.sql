-- Deploy-time input (reference: itests/tests/base/test_large_sleep,
-- scaled 10000->200 rows/wave): five bulk INSERT waves separated by
-- pg_sleep(5); count-only verification (EXPECTED_COUNT) + lsn + ledger.
CREATE TABLE customers (id serial primary key, first_name text, last_name text);
INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(1,200) AS x(id);

SELECT pg_sleep(5);

INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(201,400) AS x(id);

SELECT pg_sleep(5);

INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(401,600) AS x(id);

SELECT pg_sleep(5);

INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(601,800) AS x(id);

SELECT pg_sleep(5);

INSERT INTO customers (first_name, last_name)
SELECT 'foo', 'bar '|| x.id FROM generate_series(801,1000) AS x(id);
