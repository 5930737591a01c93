-- Basic CRUD over two tables, mirroring the semantics the reference's
-- base/test_basic input exercises: insert/update/delete plus a
-- nullable column driven to a value and back to NULL under REPLICA
-- IDENTITY FULL (old-tuple marshalling). Each autocommit statement is
-- its own transaction on the wire.
CREATE TABLE customers (id serial PRIMARY KEY, first_name text, last_name text);

INSERT INTO customers (first_name, last_name) VALUES ('Hello', 'World');
INSERT INTO customers (first_name, last_name) VALUES ('Goodbye', 'World');
UPDATE customers SET last_name = 'Friends' WHERE first_name = 'Hello';
DELETE FROM customers WHERE first_name = 'Goodbye';

CREATE TABLE products (id serial PRIMARY KEY, name text, sku integer NULL);
ALTER TABLE products REPLICA IDENTITY FULL;
INSERT INTO products (name) VALUES ('widget 1');
UPDATE products SET sku = 42 WHERE name = 'widget 1';
UPDATE products SET sku = NULL WHERE name = 'widget 1';
