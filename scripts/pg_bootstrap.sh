#!/bin/sh
# Restore the live-PostgreSQL fixture tests/test_postgres_live.py expects
# (the container resets between rounds; without this the 7 live-PG tests
# skip). Mirrors the original round-6 environment: cluster up, role
# `graft` (password `graft`, superuser — PG 15 CREATEROLE does not confer
# membership on created roles, which the D9 bootstrap-grammar test needs
# for ALTER DATABASE ... OWNER TO), database `graft_test` owned by it.
set -e
pg_ctlcluster 15 main start 2>/dev/null || true
cd /tmp
su postgres -c "psql -tA -c \"SELECT 1 FROM pg_roles WHERE rolname='graft'\"" | grep -q 1 || \
  su postgres -c "psql -c \"CREATE ROLE graft LOGIN PASSWORD 'graft' SUPERUSER\""
su postgres -c "psql -c \"ALTER ROLE graft SUPERUSER\""
su postgres -c "psql -tA -c \"SELECT 1 FROM pg_database WHERE datname='graft_test'\"" | grep -q 1 || \
  su postgres -c "psql -c \"CREATE DATABASE graft_test OWNER graft\""
PGPASSWORD=graft psql -h 127.0.0.1 -U graft -d graft_test -tA -c "SELECT 'live-PG ready'"
