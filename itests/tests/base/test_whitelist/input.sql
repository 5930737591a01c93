-- Deploy-time input (reference: itests/tests/base/test_whitelist):
-- only whitelisted tables may reach the sink.
CREATE TABLE customers (id integer PRIMARY KEY, name text);
CREATE TABLE inventory (id integer PRIMARY KEY, sku text);
CREATE TABLE scratch_notes (id integer PRIMARY KEY, body text);
INSERT INTO customers (id, name) VALUES (1, 'Ada');
INSERT INTO inventory (id, sku) VALUES (10, 'SKU-10');
INSERT INTO scratch_notes (id, body) VALUES (100, 'internal');
UPDATE customers SET name = 'Ada L' WHERE id = 1;
INSERT INTO scratch_notes (id, body) VALUES (101, 'more internal');
DELETE FROM inventory WHERE id = 10;
