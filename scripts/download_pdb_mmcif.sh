#!/bin/bash
# Mirror the PDB mmCIF archive and flatten into one directory.
# Equivalent of the reference scripts/download_pdb_mmcif.sh:39-63.
set -euo pipefail

if [[ $# -ne 1 ]]; then
  echo "usage: $0 <download_dir>" >&2
  exit 1
fi

DOWNLOAD_DIR="$1"
RAW_DIR="${DOWNLOAD_DIR}/raw"
FLAT_DIR="${DOWNLOAD_DIR}/mmcif_files"
mkdir -p "${RAW_DIR}" "${FLAT_DIR}"

echo "Syncing PDB mmCIF archive (this is ~200GB)..."
rsync --recursive --links --perms --times --compress --info=progress2 \
  --delete --port=33444 \
  rsync.rcsb.org::ftp_data/structures/divided/mmCIF/ \
  "${RAW_DIR}"

echo "Flattening..."
find "${RAW_DIR}" -type f -name '*.cif.gz' -exec ln -sf {} "${FLAT_DIR}" \;
echo "Done: $(ls "${FLAT_DIR}" | wc -l) files in ${FLAT_DIR}"
