-- Deploy-time input (reference: itests/tests/base/test_truncate):
-- TRUNCATE envelopes pass through with empty columns, including the
-- multi-relation CASCADE form.
CREATE TABLE customers (id integer PRIMARY KEY, name text);
CREATE TABLE orders (id integer PRIMARY KEY, customer_id integer REFERENCES customers(id));
INSERT INTO customers (id, name) VALUES (1, 'Ada');
TRUNCATE TABLE customers;
INSERT INTO customers (id, name) VALUES (2, 'Grace');
INSERT INTO orders (id, customer_id) VALUES (10, 2);
TRUNCATE TABLE customers CASCADE;
