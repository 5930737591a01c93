-- Basic CRUD semantics for the harness's first test: two inserts, an
-- update, a delete on a keyed table; then a nullable column driven to
-- a value and back to NULL under REPLICA IDENTITY FULL (old-tuple
-- marshalling). Each autocommit statement is its own transaction on
-- the wire.
CREATE TABLE accounts (id serial PRIMARY KEY, owner text, plan text);

INSERT INTO accounts (owner, plan) VALUES ('Ada', 'starter');
INSERT INTO accounts (owner, plan) VALUES ('Grace', 'starter');
UPDATE accounts SET plan = 'pro' WHERE owner = 'Ada';
DELETE FROM accounts WHERE owner = 'Grace';

CREATE TABLE items (id serial PRIMARY KEY, label text, qty integer NULL);
ALTER TABLE items REPLICA IDENTITY FULL;
INSERT INTO items (label) VALUES ('gizmo A');
UPDATE items SET qty = 7 WHERE label = 'gizmo A';
UPDATE items SET qty = NULL WHERE label = 'gizmo A';
