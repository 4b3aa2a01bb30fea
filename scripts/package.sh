#!/bin/sh
# Build the --py-files artifact and print the spark-submit line.
set -e
cd "$(dirname "$0")/.."
rm -f kgt.zip
zip -qr kgt.zip kgt
echo "built kgt.zip"
echo "launch: spark-submit --py-files kgt.zip jobs/build_graph.py --input <transcripts> --output <graph_dir> --chunks 256"
