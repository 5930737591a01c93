#!/bin/bash
# Allow replication connections from the compose network. wal_level /
# max_wal_senders / max_replication_slots are set via the postgres
# command flags in docker-compose.yml (reference parity: its container
# appends the same settings to postgresql.conf at init).
set -e
echo 'host replication all all md5' >> "$PGDATA/pg_hba.conf"
