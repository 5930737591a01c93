-- Two-phase commit twin of test_basic's first table: the same data
-- flows through PREPARE TRANSACTION / COMMIT PREPARED (and one
-- ROLLBACK PREPARED that must leave no trace). The engine decodes
-- b/P/K/r pgoutput frames and replays each prepared transaction as
-- BEGIN..COMMIT at its Commit Prepared — so the golden has the SAME
-- shape as a plain-transaction run, and the sandbox replay twin
-- (wal/000.jsonl) carries the equivalent post-commit canonical lines.
-- Requires: wal_level=logical, max_prepared_transactions > 0,
-- PG 15+ (TWO_PHASE slots), cli_flags below.
CREATE PUBLICATION pgbifrost FOR ALL TABLES;
CREATE TABLE accounts (id serial PRIMARY KEY, owner text, plan text);

BEGIN;
INSERT INTO accounts (owner, plan) VALUES ('Ada', 'starter');
PREPARE TRANSACTION 'tx-ada';
COMMIT PREPARED 'tx-ada';

BEGIN;
INSERT INTO accounts (owner, plan) VALUES ('Grace', 'starter');
PREPARE TRANSACTION 'tx-grace';
COMMIT PREPARED 'tx-grace';

-- rolled back at the prepared stage: must never reach the sink
BEGIN;
INSERT INTO accounts (owner, plan) VALUES ('Mallory', 'ghost');
PREPARE TRANSACTION 'tx-ghost';
ROLLBACK PREPARED 'tx-ghost';

BEGIN;
UPDATE accounts SET plan = 'pro' WHERE owner = 'Ada';
PREPARE TRANSACTION 'tx-upgrade';
COMMIT PREPARED 'tx-upgrade';

DELETE FROM accounts WHERE owner = 'Grace';
