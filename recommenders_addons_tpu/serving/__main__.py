from recommenders_addons_tpu.serving.server import main

main()
