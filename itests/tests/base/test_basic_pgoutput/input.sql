-- pgoutput twin of test_basic: identical changes, identical golden,
-- drained through the IN-CORE plugin (--plugin pgoutput via
-- cli_flags). pgoutput decodes through a publication: create it
-- up front (resolved at decode time, so post-slot creation is
-- fine). Proves plugin parity on the deploy rig; the in-sandbox
-- twin is test_basic_golden_passes_verify_via_pgoutput_wire_transport.
CREATE PUBLICATION pgbifrost FOR ALL TABLES;
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
