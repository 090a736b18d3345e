#!/usr/bin/env bash
# Round-open hygiene: commit the PREVIOUS round's driver outputs before any
# feature work. The driver writes CORRECTNESS_r{N}.json / BENCH_r{N}.json and
# refreshes LEAKCHECK.json / COPYCHECK.json / bench_detail.json AFTER the
# builder's last commit of round N, so round N+1 must adopt them as its first
# commit or they sit untracked/modified forever (judge hygiene item, rounds
# 10-15). Idempotent: commits only if there is something to stage.
set -euo pipefail
cd "$(dirname "$0")/.."

# Latest round for which the driver left a correctness artifact.
latest=$(ls CORRECTNESS_r*.json 2>/dev/null \
  | sed 's/.*_r\([0-9]*\)\.json/\1/' | sort -n | tail -1)
if [[ -z "${latest:-}" ]]; then
  echo "round_open: no CORRECTNESS_r*.json found; nothing to adopt"
  exit 0
fi

to_stage=()
for f in "CORRECTNESS_r${latest}.json" "BENCH_r${latest}.json" \
         LEAKCHECK.json COPYCHECK.json bench_detail.json; do
  [[ -e "$f" ]] || continue
  # Respect .gitignore (e.g. COPYCHECK.json is intentionally ignored).
  if git check-ignore -q "$f"; then continue; fi
  # Stage if untracked or differs from HEAD.
  if ! git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
    to_stage+=("$f")
  elif ! git diff --quiet HEAD -- "$f"; then
    to_stage+=("$f")
  fi
done

if [[ ${#to_stage[@]} -eq 0 ]]; then
  echo "round_open: round ${latest} driver artifacts already committed; clean"
  exit 0
fi

git add -- "${to_stage[@]}"
git commit -m "round open: adopt round ${latest} driver artifacts (${to_stage[*]})"
echo "round_open: committed ${#to_stage[@]} driver artifact(s) for round ${latest}"
