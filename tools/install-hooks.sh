#!/bin/sh
# Install the repo's mechanical pre-commit checklist into .git/hooks.
cd "$(git rev-parse --show-toplevel)"
cp tools/pre-commit.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
