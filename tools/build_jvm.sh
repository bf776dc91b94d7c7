#!/usr/bin/env bash
# Offline build of the JVM protobuf wire codec (jvm/src/**.scala) into
# quacfka_spark/jars/quacfka-jvm.jar.
#
# No network, no sbt: compiles with the Scala 2.13 compiler jar (matching
# Spark 4.1's Scala version) straight against the Spark distribution jars.
# Re-run after editing jvm/src; the built jar is committed so users (and
# the bench driver) don't need the compiler present.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
SCALA_COMPILER="${SCALA_COMPILER:-$(find "$HOME/.cache/coursier" -name 'scala-compiler-2.13.17.jar' 2>/dev/null | head -1)}"
[ -n "$SCALA_COMPILER" ] || { echo "scala-compiler-2.13.17.jar not found; set SCALA_COMPILER" >&2; exit 1; }

OUT=jvm/out
rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "$SCALA_COMPILER:$SPARK_JARS/scala-library-2.13.17.jar:$SPARK_JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -deprecation -feature \
  -d "$OUT" \
  $(find jvm/src -name '*.scala')

mkdir -p quacfka_spark/jars
(cd "$OUT" && jar cf ../../quacfka_spark/jars/quacfka-jvm.jar quacfka)
echo "built quacfka_spark/jars/quacfka-jvm.jar"
