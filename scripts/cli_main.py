"""spark-submit driver file: delegates to the packaged CLI
(``--py-files pss.zip`` ships the package; this file is the submit target)."""
import sys

from planet_search_spark.__main__ import main

if __name__ == "__main__":
    main(sys.argv[1:])
