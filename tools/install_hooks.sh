#!/bin/sh
# Install repo git hooks. Run once per container/clone; idempotent.
# leakguard.sh (pre-commit) sanitizes LEAKCHECK.json (hits -> sha256) and
# blocks raw build logs / resolver-internal classpaths from entering
# history — see that file's header for the r12-r17 cascade it terminates.
set -e
cd "$(dirname "$0")/.."
ln -sf ../../tools/leakguard.sh .git/hooks/pre-commit
echo "install_hooks: pre-commit -> tools/leakguard.sh"
