"""web_graph_ray.sources"""
