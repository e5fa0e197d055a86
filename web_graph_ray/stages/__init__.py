"""web_graph_ray.stages"""
