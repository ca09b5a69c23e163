from data_engineering_project_spotify_app_spark.main import main

raise SystemExit(main())
