from trisk_datawrangle_spark.run_workflow import main

raise SystemExit(main())
