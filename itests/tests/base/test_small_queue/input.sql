-- Deploy-time input (reference: itests/tests/base/test_small_queue):
-- CLIENT_BUFFER_SIZE=1 — the engine must deliver every row exactly
-- once even when the client buffer admits almost nothing per cycle.
CREATE TABLE customers (id integer PRIMARY KEY, name text);
-- 20 single-row transactions
INSERT INTO customers SELECT g, 'name-' || g FROM generate_series(1, 20) g;
