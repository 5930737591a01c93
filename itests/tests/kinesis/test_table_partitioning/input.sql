-- Deploy-time input (reference: itests/tests/kinesis/
-- test_table_partitioning): PARTITION_METHOD=tablename over a
-- 2-shard stream — each table's records must land on the shard
-- MD5(tablename) picks on the Kinesis hash ring, verified per-shard.
CREATE TABLE users (id integer PRIMARY KEY, first_name text, last_name text);
CREATE TABLE customers (id integer PRIMARY KEY, first_name text, last_name text);
INSERT INTO users VALUES (1, 'Foo', 'Bar');
INSERT INTO customers VALUES (1, 'Hello', 'World');
INSERT INTO users VALUES (2, 'Baz', 'Bar');
INSERT INTO customers VALUES (2, 'foo', '1');
UPDATE users SET last_name = 'Qux' WHERE id = 2;
DELETE FROM customers WHERE id = 1;
